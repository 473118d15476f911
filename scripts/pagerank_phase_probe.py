"""Phase/job breakdown of pagerank at a given sf (r09 optimization round).

Replicates graph/algorithms.py::pagerank's loop with per-phase timers and
statusTracker job counts, so the 8-9 s bench line can be attributed:
static setup (checkpoints + counts) vs per-superstep cost vs final join.
Diagnostic only — the engine path stays in algorithms.py.

Usage: python scripts/pagerank_phase_probe.py [sf_dir] [mode]
  mode: fixed (default) | tol
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.model import build_graph
from neo4j_database_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fixed"
    tol = 1e-3 if mode == "tol" else None
    spark = get_spark("pagerank-phase-probe")
    st = spark.sparkContext.statusTracker()
    g = build_graph(spark, sf_dir)
    # warm the store + JVM once
    galg.pagerank(g, tol=tol).write.mode("overwrite").format("noop").save()

    def jobs() -> int:
        ids = st.getJobIdsForGroup()
        return len(ids)

    # ---- instrumented copy of the warm path ----
    t = time.perf_counter()
    marks: list[tuple[str, float, int]] = []
    j0 = jobs()

    def mark(name: str) -> None:
        nonlocal t, j0
        now = time.perf_counter()
        j = jobs()
        marks.append((name, now - t, j - j0))
        t, j0 = now, j

    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    mark("nodes ckpt+count")
    small = n <= galg.BROADCAST_NODE_LIMIT
    edges = g.sym_edges(None).select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    mark("edges_deg ckpt")
    n_dang = n - out_deg.count()
    mark("out_deg count")
    active = out_deg.select(F.col("src").alias("id")).localCheckpoint()
    mark("active ckpt")
    dangling_mass = n_dang / n
    ranks = active.select("id", F.lit(1.0 / n).alias("rank"))
    assert small, "probe covers the small mode only"

    max_iter = 10
    for it in range(max_iter):
        rank_side = F.broadcast(ranks)
        # identical arithmetic to the engine:
        teleport_plus_dangling = (1.0 - 0.85) / n + 0.85 * dangling_mass / n
        ranks = (
            edges_deg.join(rank_side, edges_deg.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                F.round((F.col("rank") / F.col("deg")) * galg.CONTRIB_SCALE)
                .cast("long")
                .alias("c"),
            )
            .groupBy("id")
            .agg(
                (
                    F.lit(teleport_plus_dangling)
                    + F.lit(0.85)
                    * (F.sum("c").cast("double") / F.lit(galg.CONTRIB_SCALE))
                ).alias("rank")
            )
        )
        if it % 2 == 1 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
            mark(f"superstep pair ->ckpt it={it}")
        dangling_mass = n_dang * teleport_plus_dangling

    out = (
        g.persons.select("id", "name")
        .join(ranks, "id")
        .select("name", "rank")
        .orderBy(F.desc("rank"), F.asc("name"))
    )
    out.write.mode("overwrite").format("noop").save()
    mark("final join+sort+noop")

    total = sum(d for _, d, _ in marks)
    for name, dur, nj in marks:
        print(f"{name:28s} {dur*1000:8.0f} ms  jobs={nj}")
    print(f"{'TOTAL':28s} {total*1000:8.0f} ms")


if __name__ == "__main__":
    main()
