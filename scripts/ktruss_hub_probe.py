"""Hub-graph cell for the oriented k-truss strategy (r07).

The edge-iterator support kernel intersects FULL neighbor arrays per
edge: on a star, every spoke edge pays O(deg(hub)) — Σ over the graph
is Σ_v deg(v)² , quadratic in hub degree. The degree-ordered oriented
strategy intersects OUT-neighbor arrays (leaves have out-degree 1,
hubs ~0) and exchanges 3 narrow rows per actual triangle, so stars
cost ~O(E).

Graph: 40 hubs × 25k spokes (1M star edges, zero triangles) + a
10-hub clique (45 edges, the surviving 5-truss). Times
ktruss_edges(strategy=...) for both strategies; identical outputs
asserted.

Usage: python scripts/ktruss_hub_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from neo4j_database_spark.session import get_spark

N_HUBS = 40
SPOKES = 25_000
CLIQUE = 10


def main() -> None:
    spark = get_spark("ktruss-hub-probe")
    from neo4j_database_spark.graph.algorithms import ktruss_edges
    from neo4j_database_spark.graph.model import GraphModel

    hubs = list(range(1, N_HUBS + 1))
    spokes = (
        spark.range(N_HUBS * SPOKES)
        .select(
            (F.col("id") % N_HUBS + 1).alias("src"),
            (F.col("id") + 1000).alias("dst"),
            F.lit("FRIEND_OF").alias("type"),
        )
    )
    clique = spark.createDataFrame(
        [
            (a, b, "FRIEND_OF")
            for a in hubs[:CLIQUE]
            for b in hubs[:CLIQUE]
            if a < b
        ],
        "src long, dst long, type string",
    )
    edges = spokes.unionByName(clique).localCheckpoint()
    persons = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.format_string("N%08d", F.col("id")).alias("name"),
            F.lit("H").alias("house"),
            F.lit("S").alias("segment"),
            F.lit(0.0).alias("acctbal"),
        )
        .localCheckpoint()
    )
    houses = persons.select(F.col("house").alias("name")).distinct()
    g = GraphModel(persons=persons, houses=houses, edges=edges)

    results = {}
    for strat in ("oriented", "auto"):
        t0 = time.perf_counter()
        rows = sorted(
            (r.a_name, r.b_name, r.support)
            for r in ktruss_edges(g, strategy=strat).collect()
        )
        dt = time.perf_counter() - t0
        results[strat] = rows
        print(
            f"ktruss hub-graph strategy={strat}: {dt:.1f}s "
            f"surviving={len(rows)}",
            flush=True,
        )
    assert results["oriented"] == results["auto"], "strategy outputs differ"
    assert len(results["auto"]) == CLIQUE * (CLIQUE - 1) // 2
    print("outputs identical", flush=True)

    from neo4j_database_spark.graph.algorithms import (
        clustering_coefficient,
        triangle_count,
    )

    tri = {}
    for strat in ("oriented", "auto"):
        t0 = time.perf_counter()
        tri[strat] = triangle_count(
            g, types=("FRIEND_OF",), strategy=strat
        ).first()["n_triangles"]
        print(
            f"triangle_count hub-graph strategy={strat}: "
            f"{time.perf_counter() - t0:.1f}s n={tri[strat]}",
            flush=True,
        )
    assert tri["oriented"] == tri["auto"]
    cc = {}
    for strat in ("oriented", "auto"):
        t0 = time.perf_counter()
        cc[strat] = sorted(
            tuple(r)
            for r in clustering_coefficient(
                g, types=("FRIEND_OF",), strategy=strat
            ).collect()
        )
        print(
            f"clustering_coefficient hub-graph strategy={strat}: "
            f"{time.perf_counter() - t0:.1f}s rows={len(cc[strat])}",
            flush=True,
        )
    assert cc["oriented"] == cc["auto"]
    print("triangle/clustering outputs identical", flush=True)

    # Mid-ID hubs: the canonical wedge join's fan-out is
    # Σ in_c(b)·out_c(b) under the ARBITRARY id order — with hub ids in
    # the middle of the leaf id range each hub contributes (S/2)²
    # wedges, 1e11 at S=100k. MEASURED FINDING (r07): the default plan
    # STILL wins here (4.5 s vs oriented 10.0 s), because the wedge
    # rows never exchange — both joins' build sides are edge-sized, so
    # the 1e11 wedges are generated and probed inside ONE codegen
    # stage at ~1-2 ns each. Σ deg² is a CPU-only cost under
    # pipelined execution, not a shuffle; the oriented strategy's
    # asymptotic win for COUNTING only appears when the wedge volume
    # outgrows CPU (~1e13+) — unlike k-truss, where the full-adjacency
    # arrays are a per-edge memory payload and oriented wins 3-5x
    # today (above).
    s_mid = 100_000
    mid_spokes = spark.range(N_HUBS * s_mid).select(
        (F.col("id") % N_HUBS + 10_000_000).alias("src"),
        F.when(
            F.col("id") % 2 == 0, F.col("id") + 20_000_000
        ).otherwise(F.col("id") + 1000).alias("dst"),
        F.lit("FRIEND_OF").alias("type"),
    ).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "type",
    )
    mid_clique = spark.createDataFrame(
        [
            (a, b, "FRIEND_OF")
            for a in range(10_000_001, 10_000_001 + CLIQUE)
            for b in range(10_000_001, 10_000_001 + CLIQUE)
            if a < b
        ],
        "src long, dst long, type string",
    )
    mid_edges = mid_spokes.unionByName(mid_clique).localCheckpoint()
    mid_persons = (
        mid_edges.select(F.col("src").alias("id"))
        .unionByName(mid_edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.format_string("N%09d", F.col("id")).alias("name"),
            F.lit("H").alias("house"),
            F.lit("S").alias("segment"),
            F.lit(0.0).alias("acctbal"),
        )
        .localCheckpoint()
    )
    g_mid = GraphModel(
        persons=mid_persons,
        houses=mid_persons.select(F.col("house").alias("name")).distinct(),
        edges=mid_edges,
    )
    mid = {}
    for strat in ("oriented", "auto"):
        t0 = time.perf_counter()
        mid[strat] = triangle_count(
            g_mid, types=("FRIEND_OF",), strategy=strat
        ).first()["n_triangles"]
        print(
            f"triangle_count mid-id-hubs (S={s_mid}) strategy={strat}: "
            f"{time.perf_counter() - t0:.1f}s n={mid[strat]}",
            flush=True,
        )
    assert mid["oriented"] == mid["auto"]
    print("mid-id outputs identical", flush=True)


if __name__ == "__main__":
    main()
