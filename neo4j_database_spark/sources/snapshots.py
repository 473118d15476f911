"""Versioned copy-on-write table snapshots + version-diff CDC.

A minimal transactional layer over plain parquet — the capability
Delta/Iceberg provide, reduced to its load-bearing core so the engine
has time travel and change capture without a table-format dependency:

- every write lands in an immutable ``v=<n>/`` directory (copy-on-write:
  concurrent readers of older versions are never disturbed);
- a ``_latest`` pointer file names the current version, committed by
  write-temp + atomic rename — the ONLY mutation in the layout, so a
  crashed writer leaves a fully consistent table (its orphan version
  directory is invisible until the pointer lands);
- time travel = read any retained ``v=<n>``; rollback = move the
  pointer (O(1), no data rewritten);
- CDC = ``snapshot_diff``: one key-wise full-outer join between two
  versions classifying insert / delete / update.

Scale notes: copy-on-write rewrites the table per version — correct for
dimension-sized tables (the usual snapshot subjects); for fact-sized
tables write per-partition versions (partition the CoW unit, exactly
what the formats' file-level manifests generalize). The diff join is an
ordinary hash join on the key — partition-prunable and AQE-skew-safe
like any other.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LATEST = "_latest"
_VDIR = re.compile(r"^v=(\d+)$")


def _versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    """The committed current version (pointer file), or None if empty."""
    path = os.path.join(table_dir, _LATEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next table version; returns the version.

    The data write happens entirely inside the new (invisible) version
    directory; the atomic pointer rename is the commit point.
    """
    os.makedirs(table_dir, exist_ok=True)
    existing = _versions(table_dir)
    version = (existing[-1] + 1) if existing else 1
    df.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={version}"))
    tmp = os.path.join(table_dir, f"._latest.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _LATEST))  # atomic commit
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current version, or time-travel to an explicit one."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise ValueError(f"no committed snapshot in {table_dir}")
    path = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(path):
        raise ValueError(f"version {v} not retained in {table_dir}")
    return spark.read.parquet(path)


def rollback(table_dir: str, version: int) -> None:
    """Point the table back at an older retained version (O(1), no data
    rewrite; later versions stay readable by explicit time travel)."""
    if version not in _versions(table_dir):
        raise ValueError(f"version {version} not retained in {table_dir}")
    tmp = os.path.join(table_dir, f"._latest.tmp.rb{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _LATEST))


def history(table_dir: str) -> list[int]:
    """Retained versions, oldest first."""
    return _versions(table_dir)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Change-data capture between two table states keyed by
    ``key_cols``: one full-outer join classifying each key as
    ``insert`` (new only), ``delete`` (old only), or ``update`` (both
    present, any non-key column differs). Unchanged rows drop out.

    Null-safe value compare via struct equality over the non-key
    columns (``<=>`` semantics through eqNullSafe), so NULL→value and
    value→NULL edits register as updates.
    """
    value_cols = [c for c in old.columns if c not in key_cols]
    if [c for c in new.columns if c not in key_cols] != value_cols:
        raise ValueError("old/new schemas differ")
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.struct(*value_cols).alias("old_vals"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.struct(*value_cols).alias("new_vals"),
        F.lit(True).alias("in_new"),
    )
    joined = o.join(n, [f"k_{c}" for c in key_cols], "full_outer")
    change = (
        F.when(F.col("in_old").isNull(), F.lit("insert"))
        .when(F.col("in_new").isNull(), F.lit("delete"))
        .when(
            ~F.col("old_vals").eqNullSafe(F.col("new_vals")), F.lit("update")
        )
        .otherwise(F.lit(None))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.col(f"k_{c}").alias(c) for c in key_cols],
            "change_type",
            "old_vals",
            "new_vals",
        )
    )


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: delete version directories older than the newest
    ``keep_last``, never touching the version `_latest` points at (a
    rolled-back pointer must stay readable). Returns removed versions.

    The snapshot counterpart of Delta's VACUUM: old CoW versions are
    the storage cost of time travel; retention bounds it. Removal is
    safe against concurrent readers of RETAINED versions (directories
    are immutable); readers of a vacuumed version fail like any
    time-travel past the retention window.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("vacuum: keep_last must be >= 1")
    versions = _versions(table_dir)
    current = latest_version(table_dir)
    keep = set(versions[-keep_last:])
    if current is not None:
        keep.add(current)
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return removed
