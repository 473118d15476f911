"""Graph analytics over the node/edge DataFrames.

BASELINE.json's north star is "GraphX for analytics, not OLTP
traversal"; GraphX has no Python API, so the idiomatic PySpark
realization is iterative DataFrame programs — aggregateMessages
expressed as join + groupBy per superstep, with ``localCheckpoint()``
truncating the lineage each iteration (without it the plan tree grows
linearly in iterations and Catalyst analysis time explodes).

Scale notes:
- Each superstep is one shuffle (edges ⋈ labels on src, aggregate on
  dst). Pre-partitioning edges and labels on the join key makes
  successive supersteps reuse the partitioning (exchange reuse).
- Convergence checks are cheap aggregates (count of changed labels),
  evaluated once per superstep — not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_database_spark.graph.model import GraphModel


def degree_centrality(g: GraphModel, types: tuple[str, ...] | None = None) -> DataFrame:
    """Undirected degree per person (+ isolated persons with 0)."""
    deg = (
        g.sym_edges(types)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        g.persons.select("id", "name")
        .join(deg, "id", "left")
        .fillna(0, subset=["degree"])
        .select("name", F.col("degree").cast("long").alias("degree"))
        .orderBy("name")
    )


def connected_components(
    g: GraphModel,
    types: tuple[str, ...] = ("FRIEND_OF",),
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation connected components.

    Each superstep pulls the minimum component id over neighbors and
    keeps the smaller of (own, neighbor-min); terminates when no label
    changes. On clique-shaped graphs (the friendship rule) this
    converges in 2 supersteps; the max_iter bound is the safety rail for
    path-shaped graphs (diameter supersteps needed).

    Returns (component, size) — component = min person id in the
    component, the conventional canonical label.
    """
    edges = g.sym_edges(types).select("src", "dst").localCheckpoint()
    labels = g.persons.select("id", F.col("id").alias("comp")).localCheckpoint()

    for _ in range(max_iter):
        # Broadcast the node-label side: the edge table never shuffles
        # across supersteps and the aggregate combines map-side. (At
        # billion-node scale flip to co-partitioned edges+labels with
        # partitioning reuse instead of broadcast.)
        nbr_min = (
            edges.join(F.broadcast(labels), edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")).alias(
                    "changed"
                ),
            )
        ).localCheckpoint()  # truncate lineage every superstep
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break

    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("comp").alias("component"), "size")
        .orderBy("component")
    )


def pagerank(
    g: GraphModel,
    types: tuple[str, ...] | None = None,
    max_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the undirected view (each stored edge contributes
    both directions), uniform teleport, dangling mass redistributed
    uniformly. Iterative join-aggregate supersteps with checkpointing.
    """
    # Static structures materialize once: edges pre-joined with out-degree
    # (so the per-iteration join touches one table), dangling ids fixed.
    edges = g.sym_edges(types).select("src", "dst").localCheckpoint()
    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    # Dangling (degree-0) nodes receive no inflow, so every dangling node
    # carries the SAME rank each iteration and the leaked dangling mass
    # follows a scalar recurrence — computed on the driver, costing zero
    # Spark jobs per superstep (previously a full aggregate per
    # iteration): r_dang(t+1) = (1-d)/n + d·mass(t)/n; mass = n_dang·r.
    n_dang = n - out_deg.count()
    dangling_mass = n_dang / n  # each node starts at rank 1/n
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))

    for _ in range(max_iter):
        # Broadcast ranks (one row per node, small): the 2-orders-larger
        # edge table stays in place, contributions partial-aggregate
        # map-side, and the only shuffle carries per-node partials. At
        # billion-node scale: co-partition edges_deg and ranks on the
        # join key once and reuse the partitioning instead.
        contribs = (
            edges_deg.join(F.broadcast(ranks), edges_deg.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        teleport_plus_dangling = (1.0 - damping) / n + damping * dangling_mass / n
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport_plus_dangling)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        dangling_mass = n_dang * teleport_plus_dangling

    return (
        g.persons.select("id", "name")
        .join(ranks, "id")
        .select("name", "rank")
        .orderBy(F.desc("rank"), F.asc("name"))
    )


def bfs_distances(
    g: GraphModel,
    source_name: str,
    types: tuple[str, ...] = ("FRIEND_OF",),
    max_depth: int = 10,
) -> DataFrame:
    """Single-source shortest-path distances (unweighted BFS) over the
    undirected view.

    Frontier-expansion supersteps: join the frontier with edges,
    anti-join already-visited nodes, checkpoint, repeat until the
    frontier empties or max_depth. Only reached nodes are returned
    (unreachable ≡ absent, mirroring Cypher's shortestPath null).
    """
    edges = g.sym_edges(types).select("src", "dst").localCheckpoint()
    visited = (
        g.persons.filter(F.col("name") == source_name)
        .select("id", F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        neighbors = (
            edges.join(F.broadcast(frontier), edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_frontier = neighbors.join(
            visited.select("id"), "id", "left_anti"
        ).select("id", F.lit(depth).alias("dist")).localCheckpoint()
        if new_frontier.count() == 0:
            break
        visited = visited.unionByName(new_frontier).localCheckpoint()
        frontier = new_frontier
    return (
        g.persons.select("id", "name")
        .join(visited, "id")
        .select("name", F.col("dist").cast("int").alias("dist"))
        .orderBy("name")
    )


def triangle_count(g: GraphModel, types: tuple[str, ...] = ("SAME_FAMILY",)) -> DataFrame:
    """Total triangle count via the canonical-order three-way edge join.

    Canonical storage (src < dst by construction for symmetric types)
    gives each triangle exactly one (a<b<c) representation: count rows of
    edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c). Two shuffles; the candidate
    path explosion is bounded by per-key degree — on near-clique inputs
    restrict to sparser edge types (default SAME_FAMILY) or sample.
    """
    e = g.edges.filter(F.col("type").isin(list(types))).select("src", "dst")
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def label_propagation(
    g: GraphModel,
    types: tuple[str, ...] | None = None,
    max_iter: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation over the
    undirected view: each superstep every node adopts its neighbors'
    most frequent label (ties → smallest label, so the algorithm is
    fully deterministic, unlike classic randomized LPA).

    Iterative-join shape like ``pagerank``: the static edge table stays
    put; per superstep one join ships current labels to neighbors, one
    aggregate counts (node, label) votes, one window picks the winner.
    At scale the labels frame is co-partitioned with edges on the join
    key; ``localCheckpoint`` truncates lineage per superstep. Fixed
    ``max_iter`` keeps the result reproducible (rows-only driver check —
    iterative mode-of-neighbors is not SQL-expressible)."""
    from pyspark.sql.window import Window as W

    edges = g.sym_edges(types).select("src", "dst").localCheckpoint()
    labels = g.persons.select("id", F.col("id").alias("label")).localCheckpoint()

    for _ in range(max_iter):
        votes = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = W.partitionBy("src").orderBy(F.desc("n"), F.asc("label"))
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("bid"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, labels.id == best.bid, "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )

    return (
        g.persons.select("id", "name")
        .join(labels, "id")
        .select("name", F.col("label").alias("community"))
        .orderBy("name")
    )
