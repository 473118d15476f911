"""A/B probe: deletion-d2 route, dedup-first vs verify-first (r09).

The deletion-neighborhood d=2 generator has high candidate
MULTIPLICITY (an ed=1 pair matches at ~L variant combos, an ed=2
substitution pair at ~1), so _deletion_d2_pairs defaulted the
pre-verification dedup ON — an exchange + hash-aggregate over the
full multi-hundred-million-row candidate stream. The r09 heap-
sensitivity finding (x16 cell: ~170 s at 110g vs 328-387 s at 72g,
warm slower than cold) points at that dedup's working set as the
hog. The alternative this probe measures: dedup_candidates=False =
verify FIRST (strings broadcast-attached inside the candidate-join
codegen stage, banded levenshtein inline — multiplicity becomes
pipelined CPU), then the trailing distinct dedups only the ~65M
SURVIVORS. Both variants are output-identical by construction (the
trailing distinct canonicalizes).

Usage: python scripts/er_deletion_dedup_probe.py [mult] [runs]
Run each variant in a FRESH JVM for a fair heap comparison:
    python scripts/er_deletion_dedup_probe.py 16 2 dedup
    python scripts/er_deletion_dedup_probe.py 16 2 nodedup
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "110g")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = sys.argv[3:] or ["dedup", "nodedup"]

    from bench_scale import build_er_d2_input, load_avgs, time_noop

    from neo4j_database_spark.operators.er import edit_distance_pairs
    from neo4j_database_spark.session import get_spark

    spark = get_spark("er-deletion-dedup-probe")
    path = build_er_d2_input(spark, "/root/testdata/sf0.1", mult)
    cust = spark.read.parquet(path)
    print(f"load_start: {load_avgs()}", flush=True)

    for variant in variants:
        dedup = variant == "dedup"

        def q():
            return edit_distance_pairs(
                cust,
                "c_custkey",
                "c_name",
                max_dist=2,
                dedup_candidates=dedup,
            )

        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            time_noop(q())
            times.append(round(time.perf_counter() - t0, 2))
        n = q().count()
        print(
            f"x{mult} dedup_candidates={dedup}: runs={times} rows={n} "
            f"load={load_avgs()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
