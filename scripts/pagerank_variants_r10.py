"""Interleaved A/B of pagerank superstep formulations (r10 optimization
round), STORE-backed like the bench line (the r09 probes used the lazy
build_graph derivation, which re-runs the quadratic rule joins inside
every checkpoint build and inflates absolute numbers).

Variants (all bit-identical math — the quantized per-edge contribution
is round(rank_src/deg_src * SCALE) in every formulation; the script
asserts identical output hashes before timing):
  wide    — the r09 engine shape, inlined verbatim: edge frame
            materialized as (src, dst, deg) 3 longs/row, division per
            edge, broadcast ranks per superstep
  narrow  — the r10 engine path (galg.pagerank): per-src contribution
            quantized node-side, edge frame checkpointed WITHOUT deg
  large   — the r10 engine path forced to large mode (shuffle_hash
            contrib instead of per-superstep broadcast)

r10 measurement (quiet box, load <1 at start, min of 3):
  wide 15.39 s | narrow 7.76 s | large 9.59 s
narrow's worst run (12.6 s) beat wide's best — the narrow frame is also
the stable one under co-tenant memory pressure (wide swung to 52.9 s).

Usage: python scripts/pagerank_variants_r10.py [sf_dir] [rounds]
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.store import load_graph
from neo4j_database_spark.session import get_spark, shuffle_partitions


def pagerank_wide_r09(g, max_iter=10, damping=0.85):
    """Verbatim r09 small-mode shape: (src, dst, deg) frame, per-edge
    division, broadcast ranks."""
    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    assert n <= galg.BROADCAST_NODE_LIMIT
    edges = g.sym_edges(None).select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_deg = out_deg.localCheckpoint()
    edges_deg = edges.join(F.broadcast(out_deg), "src")
    edges_deg = edges_deg.repartition(
        shuffle_partitions(edges.sparkSession), "src"
    ).localCheckpoint()
    n_dang = n - out_deg.count()
    dangling_mass = n_dang / n
    active = out_deg.select(F.col("src").alias("id"))
    ranks = active.select("id", F.lit(1.0 / n).alias("rank"))
    iso_rank = 1.0 / n
    for it in range(max_iter):
        rank_side = F.broadcast(ranks)
        tpd = (1.0 - damping) / n + damping * dangling_mass / n
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
                    + F.lit(damping)
                    * (F.sum("c").cast("double") / F.lit(galg.CONTRIB_SCALE))
                ).alias("rank")
            )
        )
        if it % 2 == 1 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
        iso_rank = tpd
        dangling_mass = n_dang * tpd
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("pr-variants-r10")
    g = load_graph(spark, sf_dir)
    variants = {
        "wide": lambda: pagerank_wide_r09(g),
        "narrow": lambda: galg.pagerank(g),
        "large": lambda: galg.pagerank(g, broadcast_node_limit=0),
    }
    hashes = {}
    for k, fn in variants.items():
        rows = fn().collect()
        hashes[k] = hashlib.md5(
            "\n".join(f"{r['name']}|{r['rank']!r}" for r in rows).encode()
        ).hexdigest()
    print("hashes:", hashes, flush=True)
    assert len(set(hashes.values())) == 1, "VARIANTS DIVERGE"

    times = {k: [] for k in variants}
    for _ in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[k].append(round(time.perf_counter() - t0, 2))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.2f}s  runs {ts}", flush=True)
    print("load", os.getloadavg(), flush=True)


if __name__ == "__main__":
    main()
