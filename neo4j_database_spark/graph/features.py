"""Graph-feature extraction: per-person neighbor-house count matrix.

Re-expresses the reference's ML feature query (reference:
train_fix.py:18-59) — for every person, the number of *undirected*
neighbors per (relationship type × house) cell — as one declarative
aggregation. The reference chains four ``OPTIONAL MATCH`` blocks with
implicit Cypher grouping; here each undirected neighbor contributes one
row to a single edge-join and all 16 cells are conditional sums over it
(SURVEY.md §2 A3/A4), which is one shuffle instead of four.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_database_spark.graph.model import GraphModel

FEATURE_TYPES = ("FRIEND_OF", "ENEMY_OF", "SAME_FAMILY", "ROMANTIC_WITH")
FEATURE_HOUSES = ("NATION_0", "NATION_1", "NATION_2", "NATION_3")


def feature_cell_name(edge_type: str, house: str) -> str:
    return f"{edge_type.lower()}_{house.lower()}"


def feature_columns() -> list[str]:
    return [feature_cell_name(t, h) for t, h in product(FEATURE_TYPES, FEATURE_HOUSES)]


def feature_matrix(g: GraphModel, min_total: int = 0) -> DataFrame:
    """16 neighbor-count features + total, one row per connected person.

    ``min_total`` reproduces the training filter ``df['total'] > 2``
    (train_fix.py:80) when set to 3.

    Plan shape: sym_edges ⋈ persons(on dst, to fetch neighbor house) →
    single hash aggregation keyed on src with 17 conditional sums →
    join back to persons for name/house. Partial aggregation happens
    map-side, so the shuffle carries one row per (person × 17 ints),
    not one per edge.
    """
    nbr = g.persons.select(
        F.col("id").alias("dst"), F.col("house").alias("nbr_house")
    )
    joined = g.sym_edges(FEATURE_TYPES).join(nbr, "dst")

    aggs = [
        F.sum(
            F.when(
                (F.col("type") == t) & (F.col("nbr_house") == h), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(feature_cell_name(t, h))
        for t, h in product(FEATURE_TYPES, FEATURE_HOUSES)
    ]
    per_person = joined.groupBy("src").agg(*aggs)

    total = None
    for c in feature_columns():
        total = F.col(c) if total is None else total + F.col(c)
    per_person = per_person.withColumn("total", total.cast("long"))

    # Left join = the reference's OPTIONAL MATCH: disconnected persons keep
    # a row of zeros (train_fix.py:23 uses OPTIONAL MATCH for every type).
    out = (
        g.persons.select(F.col("id").alias("src"), "name", "house")
        .join(per_person, "src", "left")
        .fillna(0, subset=[*feature_columns(), "total"])
        .drop("src")
    )
    if min_total:
        out = out.filter(F.col("total") >= min_total)
    return out.orderBy("name")
