"""Phase breakdown of the CURRENT (r09) pagerank on the STORE-backed graph,
matching the bench line exactly. Diagnostic only."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.store import load_graph
from neo4j_database_spark.session import get_spark, shuffle_partitions


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("pr-phase-r10")
    g = load_graph(spark, sf_dir)
    # warm once (same as bench best-of-3 semantics)
    galg.pagerank(g).write.mode("overwrite").format("noop").save()

    for rep in range(reps):
        t = time.perf_counter()
        marks = []

        def mark(name):
            nonlocal t
            now = time.perf_counter()
            marks.append((name, now - t))
            t = now

        nodes = g.persons.select("id").localCheckpoint()
        n = nodes.count()
        mark("nodes ckpt+count")
        small = n <= galg.BROADCAST_NODE_LIMIT
        assert small
        edges = g.sym_edges(None).select("src", "dst")
        out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        out_deg = out_deg.localCheckpoint()
        mark("out_deg ckpt")
        edges_deg = edges.join(F.broadcast(out_deg), "src")
        edges_deg = edges_deg.repartition(
            shuffle_partitions(spark), "src"
        ).localCheckpoint()
        mark("edges_deg repart+ckpt")
        n_dang = n - out_deg.count()
        mark("out_deg count")
        dangling_mass = n_dang / n
        active = out_deg.select(F.col("src").alias("id"))
        ranks = active.select("id", F.lit(1.0 / n).alias("rank"))
        iso_rank = 1.0 / n
        for it in range(10):
            rank_side = F.broadcast(ranks)
            tpd = (1.0 - 0.85) / n + 0.85 * dangling_mass / n
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
                        F.lit(tpd)
                        + F.lit(0.85)
                        * (F.sum("c").cast("double") / F.lit(galg.CONTRIB_SCALE))
                    ).alias("rank")
                )
            )
            if it % 2 == 1 or it == 9:
                ranks = ranks.localCheckpoint()
                mark(f"supersteps ->ckpt it={it}")
            iso_rank = tpd
            dangling_mass = n_dang * tpd
        if n_dang:
            isolated = nodes.join(active, "id", "left_anti")
            ranks = ranks.unionByName(
                isolated.select("id", F.lit(iso_rank).alias("rank"))
            )
        out = (
            g.persons.select("id", "name")
            .join(ranks, "id")
            .select("name", "rank")
            .orderBy(F.desc("rank"), F.asc("name"))
        )
        out.write.mode("overwrite").format("noop").save()
        mark("final join+sort+noop")
        total = sum(d for _, d in marks)
        print(f"--- rep {rep} total {total*1000:.0f} ms")
        for name, dur in marks:
            print(f"  {name:30s} {dur*1000:8.0f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
