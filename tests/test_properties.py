"""Property-based tests: Spark plans vs brute-force Python references
on randomly generated small graphs (hypothesis)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_database_spark.graph import algorithms as alg
from neo4j_database_spark.graph import queries as gq
from neo4j_database_spark.graph.model import GraphModel

NAMES = [f"P{i:02d}" for i in range(8)]
HOUSES = ["H0", "H1", "H2"]

graph_strategy = st.builds(
    lambda n, house_idx, edge_bits: (
        [(i, NAMES[i], HOUSES[house_idx[i] % 3]) for i in range(n)],
        [
            (a, b)
            for k, (a, b) in enumerate(
                (a, b) for a in range(n) for b in range(a + 1, n)
            )
            if edge_bits & (1 << k)
        ],
    ),
    n=st.integers(3, 8),
    house_idx=st.lists(st.integers(0, 2), min_size=8, max_size=8),
    edge_bits=st.integers(0, 2**28 - 1),
)


def make_graph(spark, persons, edges) -> GraphModel:
    pdf = spark.createDataFrame(
        [(i, nm, h, "SEG", 0.0) for i, nm, h in persons],
        "id long, name string, house string, segment string, acctbal double",
    )
    edf = spark.createDataFrame(
        [(a, b, "FRIEND_OF") for a, b in edges] or [],
        "src long, dst long, type string",
    )
    houses = pdf.select(F.col("house").alias("name")).distinct()
    return GraphModel(persons=pdf, houses=houses, edges=edf)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graph_strategy, seed_mask=st.integers(1, 255))
def test_winder_matches_bruteforce(spark, data, seed_mask):
    persons, edges = data
    g = make_graph(spark, persons, edges)
    names = {i: nm for i, nm, _ in persons}
    seeds = [names[i] for i, _, _ in persons if seed_mask & (1 << i)]
    if not seeds:
        seeds = [persons[0][1]]

    # brute force: undirected adjacency, count seed-neighbors per candidate
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seed_ids = {i for i, nm, _ in persons if nm in seeds}
    expected = {}
    for i, nm, _ in persons:
        if nm in seeds:
            continue
        shared = {names[s] for s in adj[i] & seed_ids}
        if shared:
            expected[nm] = (len(shared), ",".join(sorted(shared)))

    # k = n disables the top-k cutoff → full ranking, no tie boundary
    rows = gq.winder(g, seeds, k=len(persons)).collect()
    got = {r["name"]: (r["common_friends"], r["shared_with"]) for r in rows}
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graph_strategy)
def test_connected_components_match_union_find(spark, data):
    persons, edges = data
    g = make_graph(spark, persons, edges)

    parent = {i: i for i, _, _ in persons}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comps = defaultdict(set)
    for i, _, _ in persons:
        comps[find(i)].add(i)
    expected = sorted((min(m), len(m)) for m in comps.values())

    rows = alg.connected_components(g).collect()
    got = sorted((r["component"], r["size"]) for r in rows)
    assert got == expected


merge_case = st.builds(
    lambda tgt_keys, src_keys, deltas, purge_bits: (
        sorted(set(tgt_keys)),
        sorted(set(src_keys)),
        deltas,
        purge_bits,
    ),
    tgt_keys=st.lists(st.integers(0, 9), min_size=1, max_size=8),
    src_keys=st.lists(st.integers(0, 12), min_size=1, max_size=8),
    deltas=st.lists(st.integers(-5, 5), min_size=13, max_size=13),
    purge_bits=st.integers(0, 2**13 - 1),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=merge_case)
def test_merge_into_matches_reference(spark, case):
    from neo4j_database_spark.operators.merge import merge_into

    tgt_keys, src_keys, deltas, purge_bits = case
    tgt = spark.createDataFrame(
        [(k, float(k * 10)) for k in tgt_keys], "k long, bal double"
    )
    src = spark.createDataFrame(
        [(k, float(deltas[k]), bool(purge_bits & (1 << k))) for k in src_keys],
        "k long, delta double, purge boolean",
    )
    got = {
        r.k: (r.bal, r.action)
        for r in merge_into(
            tgt,
            src,
            on="k",
            update_set={"bal": F.col("tgt.bal") + F.col("src.delta")},
            insert_values={"bal": F.col("src.delta")},
            delete_condition=F.col("src.purge"),
            action_col="action",
        ).collect()
    }
    # Python reference of MERGE semantics
    want = {}
    srcd = {k: (float(deltas[k]), bool(purge_bits & (1 << k))) for k in src_keys}
    for k in tgt_keys:
        if k in srcd:
            delta, purge = srcd[k]
            if not purge:
                want[k] = (k * 10 + delta, "updated")
        else:
            want[k] = (float(k * 10), "kept")
    for k in src_keys:
        if k not in tgt_keys:
            want[k] = (srcd[k][0], "inserted")
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graph_strategy, target=st.sampled_from([4, 40, 10_000]))
def test_grid_support_matches_bruteforce(spark, data, target):
    """_grid_support (the large-graph k-truss kernel) vs brute-force
    Python |N(a) ∩ N(b)| on random graphs, across grid granularities:
    target=4 forces B ≈ entry-count (mostly-empty cells, every edge
    crossing blocks), 10_000 collapses to the minimum 2x2 grid."""
    persons, edges = data
    if not edges:
        return
    g = make_graph(spark, persons, edges)
    e = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()
    got = {
        (r.src, r.dst): r.support
        for r in alg._grid_support(e, len(edges), cell_entry_target=target)
        .collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    want = {(a, b): len(nbrs[a] & nbrs[b]) for a, b in edges}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=graph_strategy, small=st.booleans())
def test_oriented_support_matches_bruteforce(spark, data, small):
    """_oriented_support (degree-ordered triangle enumeration) vs
    brute-force |N(a) ∩ N(b)| on random graphs, both the broadcast
    and the shuffle-join variants."""
    persons, edges = data
    if not edges:
        return
    g = make_graph(spark, persons, edges)
    e = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()
    got = {
        (r.src, r.dst): r.support
        for r in alg._oriented_support(e, small).collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    want = {(a, b): len(nbrs[a] & nbrs[b]) for a, b in edges}
    assert got == want
