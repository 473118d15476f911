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


if __name__ == "__main__":
    main()
