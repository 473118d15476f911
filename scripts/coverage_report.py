"""Mechanically derive driver-coverage numbers from CORRECTNESS_r*.json.

VERDICT r06 item 2: the round-6 rotation prose claimed "42 first-time
entries" / "union 162/187" while the true numbers (judge-recomputed)
were 15 first-time / union 137/188 — hand-written coverage arithmetic
drifts. This script is now the ONLY source for those numbers: it reads
every CORRECTNESS_r*.json in the repo root, intersects with the live
``queries()`` / ``oracle_sql()`` registries, and prints

  * per-round: window size, green count, FIRST-TIME-green count/names
  * the cumulative oracle-backed driver-green union
  * the backlog (oracle-backed entries with no fully-green driver row)
  * checked-but-red entries (latest driver row not fully green)
  * a staleness-ordered re-check schedule (VERDICT r06 item 8): once
    the backlog is empty, demoted greens re-enter the window oldest
    driver row first, ~20 per round, so no entry's driver evidence goes
    more than ~4 rounds stale.

"green" = rows_match AND schema_match AND hash_match all true (the
driver's full oracle comparison). Rows-only entries (err=no_oracle)
never count toward the oracle-backed union by construction.

Usage:
    python scripts/coverage_report.py            # human report
    python scripts/coverage_report.py --json     # machine-readable
    python scripts/coverage_report.py --check-window
        # assert the CURRENT driver window == keeps + entire backlog
        # (exit 1 on mismatch) — run before committing a rotation
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

RECHECK_BATCH = 20  # demoted greens re-entering per round, oldest first


def _load_rounds() -> dict[int, dict[str, dict]]:
    rounds: dict[int, dict[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def compute() -> dict:
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    oracle_backed = [n for n in registry if n in oracles]
    rows_only = [n for n in registry if n not in oracles]

    rounds = _load_rounds()
    union: set[str] = set()
    first_green: dict[str, int] = {}  # entry -> first green round
    latest_green: dict[str, int] = {}  # entry -> most recent green round
    latest_checked: dict[str, tuple[int, bool]] = {}
    per_round = []
    for rnum in sorted(rounds):
        rows = rounds[rnum]
        greens = {
            n for n, row in rows.items() if n in oracles and _is_green(row)
        }
        first_time = sorted(greens - union)
        union |= greens
        for n in greens:
            first_green.setdefault(n, rnum)
            latest_green[n] = rnum
        for n, row in rows.items():
            latest_checked[n] = (rnum, _is_green(row))
        per_round.append(
            {
                "round": rnum,
                "window": len(rows),
                "green": len(greens),
                "first_time": len(first_time),
                "first_time_names": first_time,
                "union_after": len(union & set(oracle_backed)),
            }
        )

    union_live = sorted(union & set(oracle_backed))
    backlog = sorted(n for n in oracle_backed if n not in union)
    red = sorted(
        n
        for n, (rnum, ok) in latest_checked.items()
        if n in oracles and not ok and n in registry
    )
    # staleness-ordered re-check schedule: oldest latest-green first;
    # ties broken by registry order for determinism
    reg_pos = {n: i for i, n in enumerate(registry)}
    stale_order = sorted(
        union_live, key=lambda n: (latest_green[n], reg_pos[n])
    )
    schedule = [
        stale_order[i : i + RECHECK_BATCH]
        for i in range(0, len(stale_order), RECHECK_BATCH)
    ]
    return {
        "registry_total": len(registry),
        "oracle_backed": len(oracle_backed),
        "rows_only": len(rows_only),
        "rows_only_names": rows_only,
        "per_round": per_round,
        "union": len(union_live),
        "union_names": union_live,
        "backlog": len(backlog),
        "backlog_names": backlog,
        "checked_but_red": red,
        "latest_green_round": latest_green,
        "recheck_schedule": schedule,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--check-window", action="store_true")
    args = ap.parse_args()
    rep = compute()

    if args.json:
        print(json.dumps(rep, indent=2))
    else:
        print(
            f"registry: {rep['registry_total']} queries / "
            f"{rep['oracle_backed']} oracle-backed / "
            f"{rep['rows_only']} rows-only"
        )
        for r in rep["per_round"]:
            print(
                f"  r{r['round']:02d}: window {r['window']}, green "
                f"{r['green']}, first-time {r['first_time']}, "
                f"union {r['union_after']}/{rep['oracle_backed']}"
            )
        print(
            f"driver-green union: {rep['union']}/{rep['oracle_backed']}"
            f" oracle-backed; backlog {rep['backlog']}"
        )
        if rep["backlog_names"]:
            print("backlog:", ", ".join(rep["backlog_names"]))
        if rep["checked_but_red"]:
            print("CHECKED-BUT-RED:", ", ".join(rep["checked_but_red"]))
        print(f"re-check schedule ({RECHECK_BATCH}/round, oldest first):")
        for i, batch in enumerate(rep["recheck_schedule"], 1):
            print(f"  batch {i}: {', '.join(batch)}")

    if args.check_window:
        import __spark_entry__ as entrymod

        window = list(entrymod.queries())[:50]
        missing = [n for n in rep["backlog_names"] if n not in window]
        if missing:
            print(
                f"WINDOW CHECK FAILED: {len(missing)} backlog entries "
                f"not in the first 50: {missing}",
                file=sys.stderr,
            )
            return 1
        print(
            f"window check OK: all {rep['backlog']} backlog entries are "
            f"inside the 50-entry driver window "
            f"({50 - rep['backlog']} keep slots)"
        )
        # Re-check-rotation contract (VERDICT r06 item 8): once the
        # backlog is empty the window must at minimum absorb the entire
        # MOST-STALE batch (schedule batch 1); report how deep into the
        # schedule the window reaches so a rotation that silently skips
        # stale entries fails loudly.
        if not rep["backlog_names"] and rep["recheck_schedule"]:
            b1_missing = [
                n for n in rep["recheck_schedule"][0] if n not in window
            ]
            if b1_missing:
                print(
                    "WINDOW CHECK FAILED: backlog is empty but the "
                    f"most-stale re-check batch has {len(b1_missing)} "
                    f"entries outside the window: {b1_missing}",
                    file=sys.stderr,
                )
                return 1
            full = 0
            for batch in rep["recheck_schedule"]:
                if all(n in window for n in batch):
                    full += 1
                else:
                    break
            print(
                f"re-check rotation OK: window fully covers the "
                f"{full} most-stale schedule batch(es)"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
