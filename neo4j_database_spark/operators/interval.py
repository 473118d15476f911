"""Point-in-interval (temporal) join — the range-join shape, made scalable.

`SELECT ... FROM points p JOIN intervals i ON p.t >= i.start AND
p.t < i.end` is a non-equi join: Catalyst's only generic strategy is
BroadcastNestedLoop (fine when one side is tiny — see
``part_price_bands``) or a cartesian sort-merge. At 100 TB neither
survives. Two scale paths:

1. **Equi-key carried** (``equi_keys=[...]``): the range predicate is a
   RESIDUAL on an ordinary hash join — Spark partitions both sides on
   the equi key and evaluates the bounds per matched pair. This covers
   the overwhelmingly common temporal-join case ("the dimension version
   valid at event time" joins on the dimension's natural key).

2. **No equi key** (``bucket_width=N``): intervals explode to every
   epoch bucket they overlap, points map to their single containing
   bucket, and the join becomes an equi-join on bucket id with the
   exact containment filter as residual. Each (point, interval) match
   is found exactly once — a point lives in one bucket and an interval
   appears at most once per bucket — so no post-join dedup. Explode
   fan-out = ceil(interval_len / bucket_width): pick the width near the
   median interval length so fan-out stays O(1) per interval.

Intervals are half-open ``[start, end)`` — the standard convention that
makes adjacent intervals tile without double-matching. ``end`` must be
finite: close open (current) intervals before joining (e.g. with
max(point)+1), which keeps the operator's matching logic total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__ivl_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Exactly one of ``equi_keys`` / ``bucket_width`` picks the strategy;
    with neither, falls back to the plain non-equi join (small inputs /
    broadcastable side only — Catalyst will pick BNLJ).
    """
    contains = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if equi_keys:
        return points.join(intervals, on=equi_keys, how=how).filter(contains)
    if bucket_width:
        if how != "inner":
            raise ValueError("bucketed path supports how='inner' only")
        w = int(bucket_width)
        pts = points.withColumn(
            _BUCKET, F.floor(F.col(point_col) / w).cast("long")
        )
        ivls = intervals.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w).cast("long"),
                    # end is exclusive: the last covered bucket is the one
                    # containing end-1
                    F.floor((F.col(end_col) - 1) / w).cast("long"),
                )
            ),
        )
        return pts.join(ivls, on=_BUCKET, how="inner").filter(contains).drop(_BUCKET)
    return points.join(intervals, on=contains, how=how)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    equi_keys: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join: one output row per (left,
    right) pair of half-open intervals with ``a_start < b_end AND
    b_start < a_end``.

    Same two scale paths as ``point_in_interval_join``: an equi-key
    hash join with the overlap predicate as residual, or epoch
    bucketing when no key exists. Bucketing both sides would find an
    overlapping pair once per SHARED bucket, so the bucketed path
    applies the standard ownership rule — a pair is kept only in the
    bucket containing ``greatest(a_start, b_start)``, the first instant
    both intervals cover, which both sides' explosions are guaranteed
    to include — making the result exactly-once with no distinct-cost.
    Bound columns must be numeric (epoch) and uniquely named across the
    two frames; cast timestamps to epoch seconds first.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    overlap = (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    if equi_keys:
        return left.join(right, on=equi_keys, how="inner").filter(overlap)
    if bucket_width:
        w = int(bucket_width)

        def burst(df: DataFrame, s: str, e: str) -> DataFrame:
            return df.withColumn(
                _BUCKET,
                F.explode(
                    F.sequence(
                        F.floor(F.col(s) / w).cast("long"),
                        F.floor((F.col(e) - 1) / w).cast("long"),
                    )
                ),
            )

        owner = F.floor(
            F.greatest(F.col(ls), F.col(rs)) / w
        ).cast("long")
        return (
            burst(left, ls, le)
            .join(burst(right, rs, re_), on=_BUCKET, how="inner")
            .filter(overlap)
            .filter(F.col(_BUCKET) == owner)
            .drop(_BUCKET)
        )
    return left.join(right, on=overlap, how="inner")
