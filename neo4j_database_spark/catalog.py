"""Table catalog: loaders for the driver-generated parquet tables.

All operators take DataFrames, never paths; this module is the single
place that touches storage. Scans stay declarative (``spark.read.parquet``)
so Catalyst gets predicate pushdown / column pruning / partition pruning
for free — at 100 TB these tables would be partitioned+bucketed parquet or
Iceberg/Delta and every query below this layer is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs this engine's plans depend on, applied defensively.

    The driver may hand us a SparkSession it built itself (entry(spark)
    contract), so session.py's builder configs can't be assumed:
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      reader otherwise rejects (PARQUET_TYPE_ILLEGAL);
    - UTC session timezone: timestamps must stringify/hash identically
      to the (naive-UTC) DuckDB oracle.
    Both are runtime-settable SQL confs; idempotent and cheap.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
        # as epoch-nanos. Truncate to micros (`div`, not `/`: ns epochs
        # exceed double's 2^53 exact-integer range) — DuckDB's reader
        # truncates ns→µs identically, keeping the oracle comparable.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
