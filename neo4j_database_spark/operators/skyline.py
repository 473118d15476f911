"""Skyline (Pareto-optimal set) operator.

A row survives if no other row DOMINATES it — is at least as good on
every criterion and strictly better on at least one ("maximize" columns
want larger, "minimize" want smaller). The textbook formulation is a
quadratic NOT-EXISTS self-join; at 100 TB that's a cartesian disaster.

Scale shape (the classic distributed-skyline two-phase):

1. **Partition-local pruning** (`mapInPandas`): each partition computes
   its own local skyline. Dominance is transitive, so any row dominated
   locally is dominated globally — pruning is lossless. Skylines are
   typically tiny relative to the input (O(log^d n) for random data),
   so this collapses the problem by orders of magnitude with zero
   shuffle.
2. **Exact finish**: the surviving candidates (small) run the exact
   dominance anti-join against each other. The candidate set is small
   enough that Catalyst's nested-loop is fine — and AQE broadcasts it.

The Arrow kernel is a justified Pandas path: per-partition skyline is
inherently row-iterative state (sort by first criterion, sweep), not
expressible as a fixed-depth relational plan. The FINAL answer is
engine-exact: ties and float comparisons behave identically in the
DuckDB NOT-EXISTS oracle because only comparisons (no arithmetic)
touch the values.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _dominates_cond(
    maximize: Sequence[str], minimize: Sequence[str]
) -> Column:
    """b dominates a: ≥/≤ on every criterion, strict on at least one."""
    at_least = [
        (F.col(f"b.{c}") >= F.col(f"a.{c}")) for c in maximize
    ] + [(F.col(f"b.{c}") <= F.col(f"a.{c}")) for c in minimize]
    strictly = [
        (F.col(f"b.{c}") > F.col(f"a.{c}")) for c in maximize
    ] + [(F.col(f"b.{c}") < F.col(f"a.{c}")) for c in minimize]
    cond = strictly[0]
    for s in strictly[1:]:
        cond = cond | s
    for w in at_least:
        cond = cond & w
    return cond


def _local_skyline(
    pdf: pd.DataFrame, maximize: Sequence[str], minimize: Sequence[str]
) -> pd.DataFrame:
    if pdf.empty:
        return pdf
    # canonical orientation: larger-is-better everywhere
    work = pdf.copy()
    for c in minimize:
        work[c] = -work[c]
    crits = list(maximize) + list(minimize)
    # sort by first criterion desc: a row can only be dominated by an
    # EARLIER row in this order (or an equal-first-crit row), so one
    # sweep with the running frontier suffices
    work = work.sort_values(crits, ascending=False, kind="mergesort")
    vals = work[crits].to_numpy()
    keep_idx = []
    frontier: list = []
    for i in range(len(vals)):
        v = vals[i]
        dominated = False
        for f_ in frontier:
            if (f_ >= v).all() and (f_ > v).any():
                dominated = True
                break
        if not dominated:
            frontier.append(v)
            keep_idx.append(work.index[i])
    return pdf.loc[keep_idx]


def skyline(
    df: DataFrame,
    maximize: Sequence[str] = (),
    minimize: Sequence[str] = (),
) -> DataFrame:
    """Pareto-optimal rows of ``df`` under the given criteria."""
    if not maximize and not minimize:
        raise ValueError("skyline needs at least one criterion")
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_skyline(pdf, maximize, minimize)

    candidates = df.mapInPandas(run, schema=schema)
    # exact finish on the pruned set: anti-join against dominators
    a = candidates.alias("a")
    b = candidates.alias("b")
    return a.join(
        b, _dominates_cond(maximize, minimize), "left_anti"
    ).select([F.col(f"a.{c.name}") for c in schema.fields])
