"""Coverage bookkeeping is generated, not hand-written (VERDICT r06 #2).

The round-6 rotation prose drifted ("42 first-time" / "union 162/187"
vs the true 17 / 137-of-178) because coverage arithmetic lived in
hand-maintained comments. scripts/coverage_report.py now derives every
number from CORRECTNESS_r*.json ∩ queries(); these tests pin its
invariants so a drifted claim fails CI instead of reaching a VERDICT.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

import coverage_report

import __spark_entry__ as entrymod


def test_report_shape_and_registry_agreement():
    rep = coverage_report.compute()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert rep["registry_total"] == len(qs)
    assert rep["oracle_backed"] == len(oracles)
    assert rep["rows_only"] == len(qs) - len(oracles)
    # union + backlog partition the oracle-backed set
    assert rep["union"] + rep["backlog"] == rep["oracle_backed"]
    assert not (set(rep["union_names"]) & set(rep["backlog_names"]))


def test_judge_recomputed_r06_numbers():
    """Pin the judge's corrected r06 arithmetic (VERDICT r06 #1)."""
    rep = coverage_report.compute()
    r06 = next(r for r in rep["per_round"] if r["round"] == 6)
    assert r06["green"] == 50
    assert r06["first_time"] == 17  # NOT the claimed 42
    assert r06["union_after"] == 137  # NOT the claimed 162


def test_backlog_is_inside_the_driver_window():
    """The r07 window must contain the entire never-driver-checked
    backlog — the --check-window assertion, as a pytest."""
    rep = coverage_report.compute()
    window = list(entrymod.queries())[:50]
    missing = [n for n in rep["backlog_names"] if n not in window]
    assert missing == [], missing


def test_recheck_schedule_covers_all_greens_oldest_first():
    rep = coverage_report.compute()
    flat = [n for batch in rep["recheck_schedule"] for n in batch]
    assert sorted(flat) == sorted(rep["union_names"])
    rounds = [rep["latest_green_round"][n] for n in flat]
    assert rounds == sorted(rounds)


def test_scale_cell_blocks_match_their_json():
    """Scale-cell prose is generated, never hand-written (VERDICT r08
    "What's wrong" #1: COVERAGE said 593 s where the committed JSON
    said 437.75 s). For every round whose generated block has been
    spliced into COVERAGE.md, regenerating from the committed
    BENCH_SCALE JSON must reproduce it byte-for-byte."""
    import glob
    import os
    import re

    import scale_cells_report

    repo = os.path.dirname(os.path.abspath(coverage_report.__file__))
    repo = os.path.dirname(repo)
    with open(os.path.join(repo, "COVERAGE.md")) as f:
        cov = f.read()
    checked = 0
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_SCALE_r*.json"))):
        n = int(re.search(r"r(\d+)\.json$", path).group(1))
        begin = scale_cells_report.BEGIN.format(n=n)
        if begin not in cov:
            continue
        end = scale_cells_report.END.format(n=n)
        committed = cov[cov.index(begin) : cov.index(end) + len(end)] + "\n"
        assert committed == scale_cells_report.render(n), (
            f"COVERAGE.md scale-cells r{n:02d} block drifted from "
            f"BENCH_SCALE_r{n:02d}.json — regenerate with "
            f"`python scripts/scale_cells_report.py {n} --write`"
        )
        checked += 1
    # at least the current round's block must exist once r09 lands
    assert checked >= 0
