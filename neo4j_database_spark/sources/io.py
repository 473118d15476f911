"""Schema-explicit readers and layout-aware writers.

Rules enforced here (the difference between a dev script and a 100 TB
job):
- Readers REQUIRE a schema. Inference costs an extra pass over the
  input and silently drifts types between runs; at scale both are
  outages. (The reference infers its JSON shape per call —
  get_insert.py:62; SURVEY.md §1.2.)
- Writers take an explicit layout: partition columns for pruning,
  a distribution column for file-level clustering, and a target file
  count — the three knobs that decide whether downstream scans prune
  or slurp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """One JSON object per line, explicit schema, corrupt rows isolated
    into ``_corrupt_record`` instead of poisoning the load."""
    full = schema.add("_corrupt_record", T.StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    distribute_by: str | None = None,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Parquet writer with explicit layout.

    ``partition_by`` → directory-level partition pruning;
    ``distribute_by`` → rows clustered+sorted by this column within
    files (row-group min/max pruning); ``num_files`` bounds small-file
    explosion (the silent killer of 100 TB metadata planning).
    """
    out = df
    if distribute_by is not None:
        out = out.repartition(num_files, distribute_by).sortWithinPartitions(
            distribute_by
        )
    else:
        out = out.repartition(num_files)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantine view of a PERMISSIVE load.

    Spark refuses a query that references only ``_corrupt_record``
    (the raw line isn't retained after parsing); the documented
    workaround is caching the parsed dataset first.
    """
    if "_corrupt_record" not in df.columns:
        raise ValueError("DataFrame was not loaded with a corrupt-record column")
    return df.cache().filter(F.col("_corrupt_record").isNotNull())


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table: rows hash-clustered into ``buckets`` files
    by ``bucket_by`` (optionally sorted within each bucket).

    This is the 100 TB join strategy the graph store docstrings point
    at: two tables bucketed on the same key with the same bucket count
    join with NO exchange — each task reads matching buckets from both
    sides (and with sort_by, no sort either). The same applies to
    groupBy on the bucket key. Requires ``saveAsTable`` (bucket metadata
    lives in the catalog, not the files); ``path`` keeps the data
    external so tests control the location.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, bucket_by)
    )
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 256,
    sort_within_by: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` each. Returns the number of output files.

    The small-files problem is the silent killer of long-lived 100 TB
    tables: streaming sinks and incremental batch appends produce
    thousands of KB-sized files, and every downstream scan pays task
    scheduling + footer reads per file. Compaction is the maintenance
    pass (OPTIMIZE in table formats): read, coalesce to
    ceil(bytes/target), rewrite. ``coalesce`` (not ``repartition``)
    avoids a shuffle — upstream partitions are merged, not rehashed;
    pass ``sort_within_by`` to restore clustering for row-group
    min/max pruning while the data is being rewritten anyway.
    """
    import math
    import os

    # sum of file sizes on disk ≈ compressed bytes to rewrite
    total_bytes = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    out = df.coalesce(n_files)
    if sort_within_by is not None:
        out = out.sortWithinPartitions(sort_within_by)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_files


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleaving of two non-negative integer
    columns' low ``bits`` bits: bit i of x lands at position 2i, bit i
    of y at 2i+1.

    Pure integer bit arithmetic (shifts/and/or) — codegen'd JVM-side,
    and exactly reproducible in any engine, which is why the
    events_zorder_values oracle can hash-match it bit for bit.
    """
    from pyspark.sql import functions as F

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z.cast("long")


def write_zordered(
    df: DataFrame,
    dst_dir: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the Z-order curve of two dimensions —
    the Delta OPTIMIZE ZORDER BY layout, composed from primitives.

    Range-partitioning + sorting by the interleaved key gives every
    output file a small hypercube of (x, y) space, so parquet footer
    min/max stats prune files for predicates on EITHER dimension — the
    whole point over single-column sort, which skips on one dimension
    only. At 100 TB this is the difference between scanning one file
    and scanning all of them for a point query on the second dimension.
    """
    # Scale both dims to the full [0, 2^bits) range first: interleaving
    # raw values whose bit widths differ makes the wider dimension's
    # high bits dominate the key and the curve degenerates to a
    # single-column sort. Min/max are two driver scalars (one tiny agg).
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    stats = df.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(y_col).alias("ymin"),
        F.max(y_col).alias("ymax"),
    ).first()

    def scaled(c, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return ((F.col(c) - F.lit(int(lo))) * top / span).cast("long")

    keyed = df.withColumn(
        "__z",
        zorder_key(
            scaled(x_col, stats.xmin, stats.xmax),
            scaled(y_col, stats.ymin, stats.ymax),
            bits,
        ),
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_dir)
    )


def collect_file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max manifest for the given columns — the data-
    skipping index table formats keep in their metadata layer, built
    from plain parquet with one pass: group by ``input_file_name()``
    and min/max each column. Persist the result next to the data and
    incrementally append stats for new files; at 100 TB the manifest is
    O(files), queried on the driver path in milliseconds while the data
    itself is never touched.
    """
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
        .withColumnRenamed("__file", "file")
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Data-skipping read: consult the stats manifest, read ONLY files
    whose [min, max] range for ``col`` intersects [lo, hi], and return
    (df, files_read, files_total).

    The residual filter still applies row-level (stats prune files, not
    rows). This is what a format's scan planner does with its manifest;
    here it is explicit and composable — e.g. over ``write_zordered``
    output both dimensions prune. File lists are driver-side: the
    manifest is O(files), never the data.
    """
    rows = stats.select("file", f"min_{col}", f"max_{col}").collect()
    total = len(rows)
    keep = [
        r["file"]
        for r in rows
        if not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
    ]
    if not keep:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, total
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(keep), total
