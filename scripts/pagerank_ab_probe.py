"""Interleaved A/B: r09-patched pagerank/CC (algorithms.py) vs an
inline copy of the r08 implementations, in ONE session so JVM warmup,
page cache and host noise cancel (the cross-process epochs this round
showed 9.7-127 s swings on a quiet-VM calibration — host co-tenancy).

Usage: python scripts/pagerank_ab_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.model import build_graph, GraphModel
from neo4j_database_spark.session import get_spark


def pagerank_r08(g: GraphModel, max_iter: int = 10, damping: float = 0.85):
    """Verbatim r08 pagerank (small-mode relevant parts)."""
    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    small = n <= galg.BROADCAST_NODE_LIMIT
    assert small
    edges = g.sym_edges(None).select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    n_dang = n - out_deg.count()
    dangling_mass = n_dang / n
    active = out_deg.select(F.col("src").alias("id")).localCheckpoint()
    ranks = active.select("id", F.lit(1.0 / n).alias("rank"))
    iso_rank = 1.0 / n
    for it in range(max_iter):
        rank_side = F.broadcast(ranks)
        teleport_plus_dangling = (1.0 - damping) / n + damping * dangling_mass / n
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
                    + F.lit(damping)
                    * (F.sum("c").cast("double") / F.lit(galg.CONTRIB_SCALE))
                ).alias("rank")
            )
        )
        if it % 2 == 1 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
        iso_rank = teleport_plus_dangling
        dangling_mass = n_dang * teleport_plus_dangling
    if n_dang:
        isolated = nodes.join(active, "id", "left_anti")
        ranks = ranks.unionByName(
            isolated.select("id", F.lit(iso_rank).alias("rank"))
        )
    return (
        g.persons.select("id", "name")
        .join(ranks, "id")
        .select("name", "rank")
        .orderBy(F.desc("rank"), F.asc("name"))
    )


def cc_r08(g: GraphModel, types=("FRIEND_OF",), max_iter: int = 20):
    labels = g.persons.select("id", F.col("id").alias("comp")).localCheckpoint()
    small = labels.count() <= galg.BROADCAST_NODE_LIMIT
    assert small
    edges = g.sym_edges(types).select("src", "dst").localCheckpoint()
    for _ in range(max_iter):
        label_side = F.broadcast(labels)
        nbr_min = (
            edges.join(label_side, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        nbr_min = F.broadcast(nbr_min)
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")
                ).alias("changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("comp").alias("component"), "size")
        .orderBy("component")
    )


def pagerank_nockpt(g: GraphModel, max_iter: int = 10, damping: float = 0.85):
    """r09 candidate: checkpoint-FREE superstep chain. The loop builds
    one lazy 10-superstep plan; every broadcast subtree is referenced
    exactly once, so the single final action executes each superstep
    once — no mid-loop materializations, no re-execution (the r08
    cadence grid only measured cadences WITH re-execution between
    checkpoints)."""
    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    assert n <= galg.BROADCAST_NODE_LIMIT
    from neo4j_database_spark.session import shuffle_partitions

    edges = g.sym_edges(None).select("src", "dst")
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()
    edges_deg = (
        edges.join(F.broadcast(out_deg), "src")
        .repartition(shuffle_partitions(edges.sparkSession), "src")
        .localCheckpoint()
    )
    n_dang = n - out_deg.count()
    dangling_mass = n_dang / n
    active = out_deg.select(F.col("src").alias("id"))
    ranks = active.select("id", F.lit(1.0 / n).alias("rank"))
    iso_rank = 1.0 / n
    for it in range(max_iter):
        rank_side = F.broadcast(ranks)
        teleport_plus_dangling = (1.0 - damping) / n + damping * dangling_mass / n
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
                    + F.lit(damping)
                    * (F.sum("c").cast("double") / F.lit(galg.CONTRIB_SCALE))
                ).alias("rank")
            )
        )
        iso_rank = teleport_plus_dangling
        dangling_mass = n_dang * teleport_plus_dangling
    if n_dang:
        isolated = nodes.join(active, "id", "left_anti")
        ranks = ranks.unionByName(
            isolated.select("id", F.lit(iso_rank).alias("rank"))
        )
    return (
        g.persons.select("id", "name")
        .join(ranks, "id")
        .select("name", "rank")
        .orderBy(F.desc("rank"), F.asc("name"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("pagerank-ab-probe")
    g = build_graph(spark, sf_dir)

    variants = {
        "pr_r08": lambda: pagerank_r08(g),
        # NOTE (r10): galg.pagerank is now the r10 narrow formulation;
        # the store-backed r10 A/B lives in pagerank_variants_r10.py.
        "pr_engine": lambda: galg.pagerank(g),
        "pr_nockpt": lambda: pagerank_nockpt(g),
        "cc_r08": lambda: cc_r08(g),
        "cc_engine": lambda: galg.connected_components(g),
    }
    # warm-up each once
    for fn in variants.values():
        fn().write.mode("overwrite").format("noop").save()
    times = {k: [] for k in variants}
    for _ in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[k].append(round(time.perf_counter() - t0, 2))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.2f}s  runs {ts}", flush=True)
    print(f"load {os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
