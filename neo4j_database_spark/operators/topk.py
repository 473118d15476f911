"""Grouped top-k with map-side pruning.

Spark's global top-k compiles to TakeOrderedAndProject (per-partition
heaps, driver merge — no shuffle), but TOP-K PER GROUP has no built-in
physical operator: the idiomatic window
(row_number() OVER (PARTITION BY g ORDER BY v) <= k) shuffles EVERY
input row to sort whole groups, then discards all but k·|groups| rows.
At 100 TB that shuffle is the job.

``grouped_topk`` restores the TakeOrderedAndProject shape for groups:
an Arrow-batched per-partition pass keeps only each (partition, group)
local top-k — correct because the global top-k of a group is a subset
of the union of its partition-local top-ks — then the exact window
finish runs over the pruned frame, which holds at most k·P rows per
group regardless of input size. The shuffle moves k·P·|groups| rows
instead of n.

Determinism: ties on the order column are broken by ``tie_cols``
(ascending) in BOTH the local prune and the final window, so the
result is a total order and hash-stable under any partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tie_cols: list[str],
    ascending: bool = False,
) -> DataFrame:
    """Exact top-k rows per group by ``order_col`` (desc by default),
    ties broken by ``tie_cols`` asc. Output columns = input columns
    plus ``rnk`` (1-based within group).

    ``tie_cols`` must be non-null (use key columns): pandas'
    na_position is a single global setting per sort, so null tie values
    cannot mirror Spark's per-direction null placement."""
    out_cols = df.columns

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Streaming accumulation: fold each Arrow batch into the running
        # per-group top-k instead of materializing the whole partition —
        # peak memory is O(k·groups-in-partition + batch), so a 100 TB
        # partition never sits in the Python worker at once.
        acc: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cur = (
                pdf
                if acc is None
                else pd.concat([acc, pdf], ignore_index=True)
            )
            # null placement must match Spark's window defaults (asc →
            # nulls first, desc → nulls last) or the local prune could
            # drop a row the final window would rank inside k
            cur = cur.sort_values(
                [order_col, *tie_cols],
                ascending=[ascending] + [True] * len(tie_cols),
                kind="mergesort",
                na_position="first" if ascending else "last",
            )
            acc = cur.groupby(group_cols, dropna=False, sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    pruned = df.mapInPandas(prune, schema=df.schema)
    from pyspark.sql import Window

    order = [
        F.asc(order_col) if ascending else F.desc(order_col),
        *[F.asc(c) for c in tie_cols],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(*out_cols, "rnk")
    )
