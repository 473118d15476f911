"""Generic as-of (point-in-time) join operator.

Spark has no ASOF JOIN primitive (Flink has temporal joins, DuckDB and
Pandas have ASOF; the reference app has neither — this is a §2.9-class
extension operator). The naive formulation — an inequality join
``l.ts >= r.ts`` plus a per-row argmax — explodes to
|left| × |right-rows-per-key| pairs and shows up as a
BroadcastNestedLoopJoin or a giant SortMergeJoin with range predicates.

This implementation uses the union-sort carry-forward pattern instead:

1. tag both inputs and union them into one timeline per key;
2. sort each key's timeline once (ONE shuffle of n+m rows total);
3. carry the most recent right-side payload forward with
   ``last(ignorenulls)`` over a running window;
4. keep the left rows, which now hold the as-of match.

Cost is O((n+m) log(n+m)) per key partition with a single exchange —
the standard distributed ASOF plan. At 100 TB both sides are
range-bucketed on (key, time) at write, and the sort becomes a
per-bucket merge.

Determinism: ties sort right-before-left (``is_left`` ascending), so a
right row at exactly the left timestamp matches (inclusive as-of), and
among equal right timestamps the one with the highest ``right_seq``
wins — both choices pinned by tests and mirror-able in SQL
(row_number over ts DESC, seq DESC).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    tie_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]`` within the same key group.

    Parameters
    ----------
    on : join key column name(s), present in both inputs.
    left_ts / right_ts : event-time columns (must be mutually
        comparable — same type or implicit cast).
    value_cols : right-side payload columns to carry (default: all
        right columns except keys + right_ts).
    tie_col : optional right-side column breaking ties among equal
        right timestamps (highest wins); required for deterministic
        output when right timestamps can collide within a key.
    how : 'inner' (drop left rows with no match) or 'left' (keep them
        with null payload).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*keys, right_ts)
        ]
    value_cols = list(value_cols)
    if tie_col is not None and tie_col not in right.columns:
        raise ValueError(f"tie_col {tie_col!r} not in right columns")

    # carried payload rides under reserved names; a dedicated __hit
    # marker distinguishes "no match yet" from a legitimately-NULL
    # payload value
    carried_names = [f"__asof_{c}" for c in value_cols]
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        tie.alias("__seq"),
        F.lit(1).alias("__hit"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried_names)],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__seq"].dataType).alias("__seq"),
        F.lit(None).cast("int").alias("__hit"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in zip(value_cols, carried_names)
        ],
    )
    # align column sets: right side gains null stubs for left-only columns
    left_only = [c for c in l.columns if c not in r.columns]
    for c in left_only:
        r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    timeline = l.unionByName(r.select(*l.columns))

    w = (
        Window.partitionBy(*keys)
        # right rows sort before left at equal times (inclusive as-of);
        # higher __seq sorts last → it is the value last() carries
        .orderBy("__t", "__is_left", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_cols = ["__hit", *carried_names]
    carried = timeline.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"__c_{a}")
            for a in carry_cols
        ],
    )
    rows = carried.filter(F.col("__is_left") == 1)
    if how == "inner":
        rows = rows.filter(F.col("__c___hit").isNotNull())
    return rows.select(
        *[c for c in left.columns],
        *[
            F.col(f"__c_{a}").alias(c)
            for c, a in zip(value_cols, carried_names)
        ],
    )
