"""Incremental view maintenance: keep an aggregate table current by
merging partial-aggregate deltas instead of recomputing over history.

The lakehouse pattern behind "maintain a 100 TB rollup": store the
aggregate STATE in re-mergeable form (sums, counts, min/max — the same
partials Spark's map-side combine uses inside one job, lifted to the
table level), aggregate each new batch independently (linear in the
batch), and fold it in with one state-sized merge. History is never
re-read.

Works for any distributive aggregate (sum/count/min/max) and algebraic
ones derivable from them (avg = sum/count at read time). Holistic
aggregates (median, distinct) need sketches — see operators/sketch.py
for the mergeable Count-Min / Misra-Gries counterparts.

Inserts-only for min/max (deletes can strand a min/max — the standard
IVM limitation); sum/count accept retractions as negative deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def aggregate_batch(
    batch: DataFrame, keys: list[str], spec: dict[str, tuple[str, object]]
) -> DataFrame:
    """Aggregate one batch into mergeable state rows.

    ``spec`` maps output column → (kind, input column expr), kind in
    {sum, count, min, max}. count stores a LONG partial so merges are
    plain sums.
    """
    aggs = []
    for out, (kind, col) in spec.items():
        if kind == "count":
            aggs.append(F.count(col).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(out))
        else:
            aggs.append(MERGE_FNS[kind](col).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[str, object]],
) -> DataFrame:
    """Fold an aggregated delta into the aggregate state: union the two
    partial frames and re-aggregate with each measure's MERGE function
    (sum/count partials re-sum; min/max re-min/max). One state+delta
    sized shuffle — history untouched. Exact for decimal/integer
    partials, so the merged state hash-matches a full recompute."""
    aggs = [
        MERGE_FNS[kind](out).alias(out) for out, (kind, _) in spec.items()
    ]
    return state.unionByName(delta).groupBy(*keys).agg(*aggs)
