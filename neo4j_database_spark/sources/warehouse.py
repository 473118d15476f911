"""Bucketed warehouse: the orders⋈lineitem spine without a shuffle.

At 100 TB the single biggest shuffle in a TPC-H-shaped workload is the
fact-to-fact join on the order spine: every query that relates an order
to its line items re-hashes both tables across the cluster. Writing the
two tables ONCE with ``bucketBy(N, orderkey)`` amortizes that shuffle
into the load: a bucketed parquet scan reports
``HashPartitioning(orderkey, N)``, so ``EnsureRequirements`` drops BOTH
Exchange operators from every subsequent equi-join or aggregation keyed
on the bucket column. The join becomes a per-bucket zip — embarrassingly
parallel, no network, no spill — and survives any scale-up because the
co-location is a property of the storage layout, not of the plan.

Two layout details matter and are pinned by tests/test_plan_shapes.py:

- ``repartition(N, key)`` BEFORE ``bucketBy(N, key)``: Spark's writer
  emits one file per (task, bucket) pair, so an unpartitioned write of
  T tasks yields T*N small files. Repartitioning by the same key with
  the same N uses the identical Murmur3 ``pmod`` placement the bucket
  spec uses, so every task holds exactly one bucket's rows → exactly N
  files, each wholly one bucket.
- ``sortBy(key)``: rows inside each bucket file are sorted, so the
  sort-merge join's per-bucket Sort is a cheap nearly-sorted pass (and
  disappears entirely under sessions that enable
  ``spark.sql.legacy.bucketedTableScan.outputOrdering``).

Bucket metadata lives in the session catalog (in-memory for this
engine), not in the parquet footers, so ``ensure_bucketed_spine``
registers the tables per session and rebuilds only when absent.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from neo4j_database_spark.catalog import load_table

WAREHOUSE_ROOT = os.environ.get(
    "SPARK_GRAFT_WAREHOUSE", "/tmp/neo4j_database_spark_warehouse"
)

# Bump when the written layout changes so stale paths self-invalidate.
BUCKET_VERSION = 1

# The co-location spine: both tables bucketed by the SAME join key with
# the SAME bucket count — the precondition for exchange elimination.
SPINE = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def _ident(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))


def spine_table_name(table: str, sf_dir: str, buckets: int) -> str:
    return f"bkt_v{BUCKET_VERSION}_{_ident(sf_dir)}_{table}_{buckets}"


def ensure_bucketed_spine(
    spark: SparkSession, sf_dir: str, buckets: int = 32
) -> dict[str, str]:
    """Register (building if needed) the bucketed order-spine tables.

    Returns {source_table: catalog_table_name}. Idempotent per session;
    the write is one shuffle per table — the LAST time that shuffle ever
    happens for this key.
    """
    names: dict[str, str] = {}
    for table, key in SPINE.items():
        name = spine_table_name(table, sf_dir, buckets)
        names[table] = name
        if spark.catalog.tableExists(name):
            continue
        from neo4j_database_spark.sources.io import write_bucketed

        write_bucketed(
            load_table(spark, table, sf_dir).repartition(
                buckets, F.col(key)
            ),
            table=name,
            path=os.path.join(WAREHOUSE_ROOT, name),
            bucket_by=key,
            buckets=buckets,
            sort_by=key,
        )
    return names
