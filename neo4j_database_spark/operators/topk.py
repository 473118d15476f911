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

Measured trade-off (replicated sf0.1 documents, local[32], best-of-3):
the prune ships the FULL input through the Arrow→Python round-trip,
and on a single box that costs more than the window's in-memory JVM
shuffle (64×: window 0.31-0.35 s vs pruned 0.63-0.66 s, with or
without the wide text payload). The prune's k·P-rows-per-group shuffle
bound pays off only where the exchange is the expensive resource — a
congested multi-rack cluster shuffling wide rows — not where shuffle is
memory-speed. Default to the plain window; reach for grouped_topk when
the job is provably exchange-bound (or when composing with operators
that already need the pruned frame, e.g. priority sampling's τ).
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
    missing: str = "null",
) -> DataFrame:
    """Exact top-k rows per group by ``order_col`` (desc by default),
    ties broken by ``tie_cols`` asc. Output columns = input columns
    plus ``rnk`` (1-based within group).

    Contract (pandas cannot distinguish null from NaN in a float64
    frame, so the caller must declare which one the order column may
    contain — mixing both in one column is NOT supported and the prune
    could silently drop a winner):

    - ``missing="null"`` (default): order column may contain SQL nulls
      but no NaN. Prune mirrors Spark's window placement (asc → nulls
      first, desc → nulls last).
    - ``missing="nan"``: order column may contain float NaN but no
      null. Spark orders NaN as the LARGEST double (asc → last, desc →
      FIRST — the opposite side from nulls), and the prune mirrors that.
    - ``tie_cols`` must be non-null key columns in either mode.

    An integer order column with nulls is also unsupported (Arrow
    round-trips it through float64)."""
    if missing not in ("null", "nan"):
        raise ValueError(f"missing must be 'null' or 'nan', got {missing!r}")
    # null: Spark ranks asc→first, desc→last. NaN: Spark ranks it as the
    # largest double, asc→last, desc→first.
    na_position = (
        ("first" if ascending else "last")
        if missing == "null"
        else ("last" if ascending else "first")
    )
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
            # missing-value placement must match Spark's window order
            # (see contract above) or the local prune could drop a row
            # the final window would rank inside k
            cur = cur.sort_values(
                [order_col, *tie_cols],
                ascending=[ascending] + [True] * len(tie_cols),
                kind="mergesort",
                na_position=na_position,
            )
            acc = cur.groupby(group_cols, dropna=False, sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    src = df
    if missing == "nan":
        # pandas→Arrow maps NaN back to SQL NULL (pandas has no separate
        # null for float64), so NaN order values would emerge from the
        # prune as nulls — flag them Spark-side and restore after.
        if "__nan__" in df.columns:
            raise ValueError(
                "grouped_topk(missing='nan') reserves the column name "
                "'__nan__'; rename the input column"
            )
        src = df.withColumn("__nan__", F.isnan(order_col))
    pruned = src.mapInPandas(prune, schema=src.schema)
    if missing == "nan":
        pruned = pruned.withColumn(
            order_col,
            F.when(F.col("__nan__"), F.lit(float("nan"))).otherwise(
                F.col(order_col)
            ),
        )
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
