"""Property-based checks: the Cypher compiler vs plain-Python reference
interpreters on randomized graphs.

Hypothesis generates small random typed graphs and parameters; each
template's result is recomputed with naive Python loops (edge-identity
sets for trail semantics). Examples are few (Spark jobs per example)
but the graph space they cover — uneven degrees, isolated nodes,
multi-type parallel edges, self-referential name sets — is exactly
where join-based pattern compilation goes wrong.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from neo4j_database_spark.cypher import run_cypher
from neo4j_database_spark.graph.model import GraphModel

TYPES = ("FRIEND_OF", "SAME_FAMILY")  # canonical (stored one way)


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    houses = ["H0", "H1", "H2"]
    persons = [
        (i, f"P{i:03d}", draw(st.sampled_from(houses)), "S", 0.0)
        for i in range(1, n + 1)
    ]
    n_edges = draw(st.integers(min_value=0, max_value=min(12, n * 2)))
    edges = set()
    for _ in range(n_edges):
        a = draw(st.integers(min_value=1, max_value=n))
        b = draw(st.integers(min_value=1, max_value=n))
        if a == b:
            continue
        t = draw(st.sampled_from(TYPES))
        edges.add((min(a, b), max(a, b), t))
    return persons, sorted(edges)


def _model(spark, persons, edges) -> GraphModel:
    p = spark.createDataFrame(
        persons, "id long, name string, house string, segment string, acctbal double"
    )
    e = spark.createDataFrame(
        list(edges) or [(None, None, None)],
        "src long, dst long, type string",
    ).filter(F.col("src").isNotNull())
    houses = p.select(F.col("house").alias("name")).distinct()
    return GraphModel(persons=p, houses=houses, edges=e)


def _adj(edges, t):
    out = {}
    for a, b, et in edges:
        if et != t:
            continue
        out.setdefault(a, set()).add((b, (a, b, et)))
        out.setdefault(b, set()).add((a, (a, b, et)))
    return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graphs(), t=st.sampled_from(TYPES))
def test_one_hop_matches_python(spark, data, t):
    persons, edges = data
    g = _model(spark, persons, edges)
    got = {
        (r.a, r.b)
        for r in run_cypher(
            g,
            f"MATCH (a:Person)-[:{t}]-(b:Person) "
            "RETURN a.name as a, b.name as b",
        ).collect()
    }
    names = {i: nm for i, nm, *_ in persons}
    adj = _adj(edges, t)
    want = {
        (names[a], names[b])
        for a, nbrs in adj.items()
        for b, _ in nbrs
    }
    assert got == want


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graphs(), t=st.sampled_from(TYPES))
def test_two_hop_trails_match_python(spark, data, t):
    persons, edges = data
    g = _model(spark, persons, edges)
    got = {
        (r.b, r.n)
        for r in run_cypher(
            g,
            f"MATCH (a:Person {{name: 'P001'}})-[:{t}*2]-(b:Person) "
            "RETURN b.name as b, count(b) as n",
        ).collect()
    }
    names = {i: nm for i, nm, *_ in persons}
    adj = _adj(edges, t)
    counts: dict[str, int] = {}
    for x, e1 in adj.get(1, set()):
        for b, e2 in adj.get(x, set()):
            if e1 == e2:
                continue  # trail: no relationship reuse
            counts[names[b]] = counts.get(names[b], 0) + 1
    want = set(counts.items())
    assert got == want


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graphs(), t=st.sampled_from(TYPES))
def test_optional_degree_matches_python(spark, data, t):
    persons, edges = data
    g = _model(spark, persons, edges)
    got = {
        (r.name, r.d)
        for r in run_cypher(
            g,
            f"MATCH (a:Person) OPTIONAL MATCH (a)-[:{t}]-(b:Person) "
            "WITH a, count(b) as d RETURN a.name as name, d",
        ).collect()
    }
    adj = _adj(edges, t)
    want = {
        (nm, len(adj.get(i, set()))) for i, nm, *_ in persons
    }
    assert got == want
