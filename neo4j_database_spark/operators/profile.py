"""Column-level data profiling: the "summarize this table" operator
every warehouse exposes (DESCRIBE/SUMMARY, Deequ/GE profilers).

One long-format row per column: null count, exact distinct count, and
numeric min/max. Works on any DataFrame — the engine-facing generic
operator — with a registered query profiling `orders`
(__spark_entry__: orders_profile).

Scale design:
- ONE pass over the data for all per-column null/min/max metrics: a
  single aggregate projecting every metric column-wise (Catalyst fuses
  them into one partial+final hash aggregate with no grouping key — a
  reduce, not a shuffle of rows).
- Exact distinct counts are per-column shuffles by nature (count
  distinct over different keys cannot share one exchange). They run as
  one aggregate with N countDistinct expressions, which Spark plans as
  expand+aggregate — the data is replicated N× in the map stage but
  still one shuffle. For 100 TB profiling you'd swap exact distinct for
  approx_count_distinct (HLL, merges in the same single pass, no
  expand); exact is kept here for oracle checkability.
- Numeric min/max are raw data points (no summation), so doubles are
  engine-exact and the driver hash is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float"}


def profile(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """Long-format profile: (column, n_nulls, n_distinct, min_num, max_num).

    min/max are reported for numeric columns only (NULL otherwise) —
    cross-type min/max would force everything through strings, and
    engines disagree on float/timestamp string rendering.
    """
    cols = df.columns
    aggs = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        is_num = dt in _NUMERIC
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls")
        )
        aggs.append(
            (
                F.approx_count_distinct(c)
                if approx_distinct
                else F.countDistinct(c)
            )
            .cast("long")
            .alias(f"{c}__distinct")
        )
        aggs.append(
            (
                F.min(F.col(c)).cast("double")
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"{c}__min")
        )
        aggs.append(
            (
                F.max(F.col(c)).cast("double")
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"{c}__max")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column via stack()
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.append(f"`{c}__nulls`")
        stack_args.append(f"`{c}__distinct`")
        stack_args.append(f"`{c}__min`")
        stack_args.append(f"`{c}__max`")
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "as (column, n_nulls, n_distinct, min_num, max_num)"
        )
    ).orderBy("column")
