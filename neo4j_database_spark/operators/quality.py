"""Declarative data-quality rule checking — the dbt-tests / Deequ
constraint-suite operator: a set of named row-level predicates evaluated
in ONE aggregation pass, reporting violation counts per rule.

Scale design: every rule compiles to a conditional-sum expression inside
the same hash aggregate (no grouping key → a reduce), so checking 50
rules over 100 TB costs one scan — violations are counted map-side and
merged as integers. Contrast with running one COUNT(*) query per rule
(N scans) or collecting violating rows (unbounded output): callers who
need samples join the predicate back against the table for the few
failing rules only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named pass-predicates; one row per rule:
    (rule, n_rows, n_violations, pass_rate, ok).

    A rule is a boolean Column that is True when the ROW PASSES. NULL
    predicate results count as violations (unknown ≠ verified), the
    conservative reading a constraint suite wants.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, 1).otherwise(0)
            )
            .cast("long")
            .alias(f"{name}__v")
        )
    wide = df.agg(*aggs)
    stack_args = []
    for name in rules:
        stack_args.append(f"'{name}'")
        stack_args.append(f"`{name}__v`")
    long = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(rules)}, {', '.join(stack_args)}) "
            "as (rule, n_violations)"
        ),
    )
    return long.select(
        "rule",
        "n_rows",
        "n_violations",
        (
            (F.col("n_rows") - F.col("n_violations")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("pass_rate"),
        (F.col("n_violations") == 0).alias("ok"),
    ).orderBy("rule")
