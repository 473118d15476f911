"""Graph-model invariants (SURVEY.md §5): MERGE-style uniqueness,
canonical direction for symmetric types, both-direction storage for
bidirectional types, no self-loops, symmetrized view behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.graph.model import (
    BIDIRECTIONAL_TYPES,
    CANONICAL_TYPES,
    GraphModel,
    build_graph,
)


@pytest.fixture(scope="module")
def g(spark, sf_dir) -> GraphModel:
    return build_graph(spark, sf_dir)


def test_edges_unique(g):
    total = g.edges.count()
    distinct = g.edges.dropDuplicates(["src", "dst", "type"]).count()
    assert total == distinct > 0


def test_no_self_loops(g):
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0


def test_canonical_types_stored_once(g):
    """FRIEND_OF/SAME_FAMILY stored with name(src) < name(dst) only
    (reference stores one direction via id(a)<id(b), get_insert.py:126,136)."""
    names = g.persons.select("id", "name")
    e = (
        g.edges.filter(F.col("type").isin(list(CANONICAL_TYPES)))
        .join(names.withColumnsRenamed({"id": "src", "name": "sn"}), "src")
        .join(names.withColumnsRenamed({"id": "dst", "name": "dn"}), "dst")
    )
    assert e.filter(F.col("sn") >= F.col("dn")).count() == 0


def test_bidirectional_types_stored_both_ways(g):
    """ENEMY_OF/ROMANTIC_WITH exist in both directions
    (get_insert.py:143-144,161-162)."""
    for t in BIDIRECTIONAL_TYPES:
        e = g.edges.filter(F.col("type") == t)
        fwd = e.select("src", "dst")
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        assert fwd.exceptAll(rev).count() == 0
        assert e.count() % 2 == 0


def test_sym_edges_counts(g):
    """Symmetrizing doubles canonical types, leaves bidirectional alone."""
    by_type = {r["type"]: r["n"] for r in
               g.edges.groupBy("type").agg(F.count("*").alias("n")).collect()}
    sym_by_type = {r["type"]: r["n"] for r in
                   g.sym_edges().groupBy("type").agg(F.count("*").alias("n")).collect()}
    for t, n in by_type.items():
        expected = 2 * n if t in CANONICAL_TYPES else n
        assert sym_by_type[t] == expected


def test_friend_edges_match_pair_formula(g):
    """FRIEND_OF per house == C(n_house, 2) — the quadratic rule J6."""
    sizes = {r["house"]: r["n"] for r in
             g.persons.groupBy("house").agg(F.count("*").alias("n")).collect()}
    friend_src_house = (
        g.edges.filter(F.col("type") == "FRIEND_OF")
        .join(g.persons.select(F.col("id").alias("src"), "house"), "src")
        .groupBy("house").agg(F.count("*").alias("n"))
    )
    for r in friend_src_house.collect():
        n = sizes[r["house"]]
        assert r["n"] == n * (n - 1) // 2
