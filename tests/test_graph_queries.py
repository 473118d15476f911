"""Hand-computable fixture tests for Cypher-semantics queries.

A tiny persons/edges graph (FIXTURES.md §3) where expected outputs are
worked out by hand — exercises undirected expansion, anti-join seeding,
common-neighbors scoring with ties, and the no-double-count property of
the feature matrix (SURVEY.md §7 "hard parts" 2, 3, 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.graph import queries as gq
from neo4j_database_spark.graph.features import feature_matrix
from neo4j_database_spark.graph.model import GraphModel


@pytest.fixture(scope="module")
def tiny(spark) -> GraphModel:
    # 6 persons across 3 houses; hand-picked edges.
    persons = spark.createDataFrame(
        [
            (1, "Alice A", "NATION_0", "SEG", 1.0),
            (2, "Bob B", "NATION_0", "SEG", 2.0),
            (3, "Cara C", "NATION_1", "SEG", 3.0),
            (4, "Dan D", "NATION_1", "SEG", 4.0),
            (5, "Eve E", "NATION_2", "SEG", 5.0),
            (6, "Fay F", "NATION_2", "SEG", 6.0),
        ],
        "id long, name string, house string, segment string, acctbal double",
    )
    # FRIEND_OF canonical (src name < dst name); ROMANTIC_WITH both ways.
    edges = spark.createDataFrame(
        [
            (1, 2, "FRIEND_OF"),   # Alice—Bob
            (1, 3, "FRIEND_OF"),   # Alice—Cara
            (2, 3, "FRIEND_OF"),   # Bob—Cara
            (1, 4, "FRIEND_OF"),   # Alice—Dan
            (5, 6, "FRIEND_OF"),   # Eve—Fay
            (3, 5, "ROMANTIC_WITH"),
            (5, 3, "ROMANTIC_WITH"),
            (1, 2, "SAME_FAMILY"),
        ],
        "src long, dst long, type string",
    )
    houses = persons.select(F.col("house").alias("name")).distinct()
    return GraphModel(persons=persons, houses=houses, edges=edges)


def test_ego_network_undirected(tiny):
    """Cara (3): FRIEND Alice + Bob (as dst), ROMANTIC Eve (both stored) —
    canonical types must expand in BOTH directions, bidirectional once."""
    rows = gq.ego_network(tiny, "Cara C").collect()
    got = {(r["neighbor"], r["rel_type"]) for r in rows}
    assert got == {
        ("Alice A", "FRIEND_OF"),
        ("Bob B", "FRIEND_OF"),
        ("Eve E", "ROMANTIC_WITH"),
    }
    assert len(rows) == 3  # Eve appears once, not twice


def test_winder_common_neighbors_and_tiebreak(tiny):
    """Seeds {Bob, Dan}: candidates via FRIEND/FAMILY/ROMANCE expansion.
    Alice: friend of Bob + friend of Dan + family of Bob → 2 distinct seeds.
    Cara: friend of Bob → 1. No one else adjacent to seeds.
    """
    rows = gq.winder(tiny, ["Bob B", "Dan D"], k=3).collect()
    assert [(r["name"], r["common_friends"]) for r in rows] == [
        ("Alice A", 2),
        ("Cara C", 1),
    ]
    assert rows[0]["shared_with"] == "Bob B,Dan D"


def test_housemates(tiny):
    rows = gq.housemates(tiny, "Alice A").collect()
    assert [r["mate"] for r in rows] == ["Bob B"]


def test_house_subgraph_both_endpoints(tiny):
    """Only edges with BOTH endpoints inside the requested houses."""
    rows = gq.house_subgraph(tiny, ["NATION_0", "NATION_1"]).collect()
    got = {(r["src_name"], r["dst_name"], r["rel_type"]) for r in rows}
    assert got == {
        ("Alice A", "Bob B", "FRIEND_OF"),
        ("Alice A", "Cara C", "FRIEND_OF"),
        ("Bob B", "Cara C", "FRIEND_OF"),
        ("Alice A", "Dan D", "FRIEND_OF"),
        ("Alice A", "Bob B", "SAME_FAMILY"),
        # Cara—Eve romance excluded: Eve is NATION_2
    }


def test_house_subgraph_nodes_includes_hubs(tiny):
    """Node list of /graph/houses: member persons + one hub per house
    (reference app.py:410-434 query #2)."""
    rows = gq.house_subgraph_nodes(tiny, ["NATION_0", "NATION_1"]).collect()
    got = [(r["node_id"], r["label"], r["grp"], r["house"]) for r in rows]
    assert got == [
        ("NATION_0", "NATION_0", "house", None),
        ("NATION_1", "NATION_1", "house", None),
        ("1", "Alice A", "person", "NATION_0"),
        ("2", "Bob B", "person", "NATION_0"),
        ("3", "Cara C", "person", "NATION_1"),
        ("4", "Dan D", "person", "NATION_1"),
    ]


def test_winder_enrichment_columns(tiny):
    """Winder carries candidate house + image (app.py:223-227); derived
    image is a pure function of id (with_person_props)."""
    rows = gq.winder(tiny, ["Bob B", "Dan D"], k=3).collect()
    byname = {r["name"]: r for r in rows}
    assert byname["Alice A"]["house"] == "NATION_0"
    assert byname["Cara C"]["house"] == "NATION_1"
    # id=1 → 1 % 10 < 3 → empty image; id=3 → non-empty derived URL
    assert byname["Alice A"]["image"] == ""
    assert byname["Cara C"]["image"] == "https://img.invalid/p3.png"


def test_feature_matrix_no_double_count(tiny):
    """Undirected neighbors counted once per neighbor (train_fix.py
    semantics): Cara has friends Alice+Bob (NATION_0) and romance Eve
    (NATION_2); Alice has 3 friends + 1 family."""
    fm = {r["name"]: r for r in feature_matrix(tiny).collect()}
    cara = fm["Cara C"]
    assert cara["friend_of_nation_0"] == 2
    assert cara["friend_of_nation_1"] == 0
    assert cara["romantic_with_nation_2"] == 1
    assert cara["total"] == 3
    alice = fm["Alice A"]
    assert alice["friend_of_nation_0"] == 1  # Bob
    assert alice["friend_of_nation_1"] == 2  # Cara, Dan
    assert alice["same_family_nation_0"] == 1  # Bob
    assert alice["total"] == 4
    # disconnected-person row still present with zeros (OPTIONAL MATCH)
    assert all(r["total"] >= 0 for r in fm.values()) and len(fm) == 6


def test_search_and_directory(tiny):
    assert [r["name"] for r in gq.search(tiny, "aLiCe").collect()] == ["Alice A"]
    assert [r["name"] for r in gq.directory(tiny).collect()] == sorted(
        ["Alice A", "Bob B", "Cara C", "Dan D", "Eve E", "Fay F"]
    )


def test_link_prediction_scores(tiny):
    # Seed Alice(1): N = {Bob, Cara, Dan}. Two-hop candidates outside
    # N∪{seed}: only Eve(5) via Cara. deg(Alice)=3, deg(Eve)=2 →
    # common=1, jaccard=1/(3+2-1), pref_attach=3·2.
    rows = gq.link_prediction_scores(tiny, "Alice A").collect()
    assert [
        (r.name, r.common_neighbors, r.jaccard_num, r.jaccard_den, r.pref_attach)
        for r in rows
    ] == [("Eve E", 1, 1, 4, 6)]
