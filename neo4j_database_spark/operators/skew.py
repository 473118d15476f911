"""Skew-mitigation strategies for joins and aggregations.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime and is the first line of defense for the
quadratic same-house self-join (SURVEY.md §2 J6). These utilities are
the *explicit* fallback for when runtime splitting isn't available or
the skew is in an aggregation key:

- ``salted_join``: replicate the small side S ways, scatter the big
  side's hot keys across S salt buckets → the hot key's rows spread
  over S tasks instead of one straggler.
- ``two_stage_count``: salt → partial aggregate → final aggregate, the
  map-side-combine pattern made explicit for skewed groupBy keys.

Both are semantics-preserving (tested against their unsalted twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` carries skewed join keys.

    Each big-side row gets a deterministic salt (xxhash64 of its own
    columns mod num_salts — deterministic unlike rand(), and uniform
    within a hot key); the small side is replicated across all salts
    via explode. The join key becomes (key, salt), so one hot key's
    rows spread over ``num_salts`` tasks instead of one straggler.

    Only ``inner`` and ``left`` (big side preserved) are supported:
    each big row carries exactly one salt, so unmatched big rows emit
    once and semantics are preserved. ``right``/``full_outer`` would
    emit ``num_salts`` duplicates for every unmatched SMALL-side key
    (the small side is replicated across all salts) — refuse rather
    than silently corrupt.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, "
            f"got how={how!r} (the exploded small side would duplicate "
            f"unmatched keys)"
        )
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)
        ).cast("int"),
    )
    small_replicated = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    out = big_salted.join(small_replicated, [on, SALT_COL], how)
    return out.drop(SALT_COL)


def two_stage_count(df: DataFrame, key: str, num_salts: int = 16) -> DataFrame:
    """COUNT per (possibly hot) key via explicit salt → partial → final.

    Spark's hash aggregate already partial-aggregates map-side; this
    makes the pattern explicit for cases where the *partial* state
    itself is the bottleneck (e.g. count-distinct style states), and
    serves as the template for salting any algebraic aggregate.
    """
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)).cast(
            "int"
        ),
    )
    partial = salted.groupBy(key, SALT_COL).agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key).agg(F.sum("_pc").cast("long").alias("n"))


def skewed_key_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total, descending —
    the first thing to look at before choosing a mitigation."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(total))
        .orderBy(F.desc("n"))
        .limit(top)
    )
