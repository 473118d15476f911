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
    - nanosAsLong: events.parquet has shipped as TIMESTAMP(NANOS), which
      the reader otherwise rejects (PARQUET_TYPE_ILLEGAL); harmless for
      micros-encoded data;
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
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to session-tz TIMESTAMP, whatever
    the physical parquet encoding was.

    The generator has shipped events.ts as parquet TIMESTAMP(NANOS)
    (arrives as epoch-nanos long under nanosAsLong) and as TIMESTAMP(MICROS)
    (arrives as TIMESTAMP_NTZ since the writer marks it not-UTC-adjusted).
    Dispatch on the loaded dtype so both encodings produce the same
    column: for nanos, truncate with integer `div` (ns epochs exceed
    double's 2^53 exact range — DuckDB's reader truncates ns→µs the same
    way); for NTZ, reinterpret the naive value in the session timezone
    (pinned UTC by ensure_session_confs), which is exactly how the DuckDB
    oracle treats it.
    """
    dt = df.schema[col].dataType.typeName()
    if dt in ("long", "bigint"):
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
