"""Materialized graph store: build the property graph once, serve many.

The reference separates ETL (get_insert.py writes the graph into Neo4j)
from serving (app.py queries the stored graph). Re-deriving the
rule-based edges (a quadratic self-join) inside every serving query is
the anti-pattern; this module materializes ``persons`` / ``houses`` /
``edges`` as parquet once per source directory and serves queries from
the store.

Layout & scale design:
- ``edges`` is written partitioned by ``type``: every serving query that
  touches a subset of relationship types (winder excludes ENEMY_OF, ego
  reads all, feature matrix reads 4) gets partition pruning for free.
- Within each type partition, edges are written sorted by ``src`` —
  parquet min/max row-group stats turn point expansions (ego of one
  person) into a near-point read. At 100 TB this becomes bucketing on
  ``src`` so 1-hop expansion is a co-located join.
- The store is content-addressed by source dir; a marker file makes the
  build idempotent and safe to race.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from neo4j_database_spark.graph.model import (
    GraphModel,
    build_edges,
    houses_df,
    persons_df,
)

CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_GRAPH_CACHE", "/tmp/neo4j_database_spark_graph"
)


def _store_dir(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    return os.path.join(CACHE_ROOT, key)


def build_store(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """One-shot ETL: derive the graph and persist it (SURVEY.md §3.2).

    This is the Spark replacement for the reference's per-row MERGE loop
    (get_insert.py:76-111) — one batch job, set-based rule joins, no
    round trips.
    """
    # The persons dim feeds both sides of all four rule joins (8 scans);
    # cache it once for the build and release after.
    persons = persons_df(spark, sf_dir).cache()
    persons.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "persons")
    )
    houses_df(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "houses")
    )
    n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        build_edges(persons)
        # Hash-partition on src (NOT repartitionByRange: its sampling pass
        # would execute the quadratic rule joins twice), sorted by src
        # within each file. The writer's partitionBy(type) then lands
        # n_files files per type — parallel scans for the dominant
        # FRIEND_OF partition — and the in-file src ordering keeps parquet
        # row-group min/max stats effective for point expansions. At
        # 100 TB this is bucketing on src, making 1-hop a co-located join.
        .repartition(n_files, "src")
        .sortWithinPartitions("type", "src", "dst")
        .write.mode("overwrite")
        .partitionBy("type")
        .parquet(os.path.join(out_dir, "edges"))
    )
    persons.unpersist()


def load_graph(spark: SparkSession, sf_dir: str) -> GraphModel:
    """Load the materialized graph, building it first if absent.

    Falls back to the purely-lazy derivation if the cache location is
    not writable (e.g. read-only sandbox).
    """
    out_dir = _store_dir(sf_dir)
    marker = os.path.join(out_dir, "_BUILT")
    if not os.path.exists(marker):
        try:
            build_store(spark, sf_dir, out_dir)
            with open(marker, "w") as f:
                f.write(sf_dir)
        except Exception:
            # Cache unavailable → serve from the lazy plans.
            persons = persons_df(spark, sf_dir)
            return GraphModel(
                persons=persons,
                houses=houses_df(spark, sf_dir),
                edges=build_edges(persons),
            )
    return GraphModel(
        persons=spark.read.parquet(os.path.join(out_dir, "persons")),
        houses=spark.read.parquet(os.path.join(out_dir, "houses")),
        edges=spark.read.parquet(os.path.join(out_dir, "edges")),
    )
