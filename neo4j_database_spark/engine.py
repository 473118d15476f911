"""WinderEngine: the reference app's full serving surface on one object.

One method per reference HTTP endpoint (reference app.py:37-449), so a
user of the Flask+Neo4j app can switch by replacing Bolt calls with
these — same inputs, same semantics, same response shapes (including
the Cytoscape.js elements JSON the UI consumes, app.py:325-363).

The engine holds the materialized graph (store.load_graph) and the
trained classifier; every method is a Catalyst plan + a small collect,
mirroring the query-then-serialize lifecycle of SURVEY.md §3.1.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_database_spark.graph import queries as gq
from neo4j_database_spark.graph.model import GraphModel
from neo4j_database_spark.graph.store import load_graph


def cytoscape_elements(
    nodes: DataFrame, edges: DataFrame
) -> dict[str, Any]:
    """S8: serialize a (nodes, edges) pair into the Cytoscape.js
    ``{elements: {nodes: [...], edges: [...]}}`` shape (app.py:325-363).

    nodes needs (id, label, group, house); edges needs
    (source, target, label). Dedup matches the reference's added_nodes
    set (app.py:265).
    """
    node_rows = nodes.dropDuplicates(["id"]).collect()
    edge_rows = edges.dropDuplicates(["source", "target", "label"]).collect()
    return {
        "elements": {
            "nodes": [
                {
                    "data": {
                        "id": str(r["id"]),
                        "label": r["label"],
                        "group": r["group"],
                        "house": r["house"],
                    }
                }
                for r in node_rows
            ],
            "edges": [
                {
                    "data": {
                        "source": str(r["source"]),
                        "target": str(r["target"]),
                        "label": r["label"],
                    }
                }
                for r in edge_rows
            ],
        }
    }


class WinderEngine:
    """The seven serving endpoints, Spark-native."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.graph: GraphModel = load_graph(spark, sf_dir)

    # -- GET /characters (app.py:188-204) --
    def characters(self) -> list[dict[str, Any]]:
        return [r.asDict() for r in gq.directory(self.graph).collect()]

    # -- GET /search?q= (app.py:437-446) --
    def search(self, q: str, limit: int = 10) -> list[dict[str, Any]]:
        return [r.asDict() for r in gq.search(self.graph, q, limit).collect()]

    # -- POST /winder (app.py:206-245) --
    def winder(self, friends: Sequence[str], k: int = 3) -> list[dict[str, Any]]:
        if not friends:
            raise ValueError("friends list must be non-empty")  # app.py:210-212
        out = gq.winder(self.graph, friends, k).collect()
        return [
            {
                "name": r["name"],
                "common_friends": r["common_friends"],
                "shared_with": r["shared_with"].split(",") if r["shared_with"] else [],
            }
            for r in out
        ]

    # -- GET /graph/ego/<name> (app.py:247-285) --
    def ego_graph(self, name: str, limit: int = 500) -> dict[str, Any]:
        ego = gq.ego_network(self.graph, name, limit)
        persons = self.graph.persons
        ids = persons.select(
            "name",
            F.col("id").alias("nid"),
            F.col("house").alias("nhouse"),
        )
        nodes = (
            ego.select(F.col("person").alias("name"))
            .union(ego.select(F.col("neighbor").alias("name")))
            .distinct()
            .join(ids, "name")
            .select(
                F.col("nid").alias("id"),
                F.col("name").alias("label"),
                F.lit("person").alias("group"),
                F.col("nhouse").alias("house"),
            )
        )
        edges = (
            ego.join(ids.withColumnsRenamed({"name": "person"}), "person")
            .withColumnsRenamed({"nid": "source"})
            .drop("nhouse")
            .join(ids.withColumnsRenamed({"name": "neighbor"}), "neighbor")
            .withColumnsRenamed({"nid": "target"})
            .select("source", "target", F.col("rel_type").alias("label"))
        )
        return cytoscape_elements(nodes, edges)

    # -- GET /graph/houses?houses= (app.py:366-434) --
    def house_graph(
        self, houses: Sequence[str], limit: int = 5000
    ) -> dict[str, Any]:
        sub = gq.house_subgraph(self.graph, houses, limit)
        members = self.graph.persons.filter(F.col("house").isin(list(houses)))
        nodes = members.select(
            F.col("id"),
            F.col("name").alias("label"),
            F.lit("person").alias("group"),
            "house",
        )
        ids = members.select("name", F.col("id").alias("nid"))
        edges = (
            sub.join(ids.withColumnsRenamed({"name": "src_name"}), "src_name")
            .withColumnsRenamed({"nid": "source"})
            .join(ids.withColumnsRenamed({"name": "dst_name"}), "dst_name")
            .withColumnsRenamed({"nid": "target"})
            .select("source", "target", F.col("rel_type").alias("label"))
        )
        return cytoscape_elements(nodes, edges)

    # -- GET /housemates/<name> (app.py:287-301) --
    def housemates(self, name: str, limit: int = 100) -> list[str]:
        return [r["mate"] for r in gq.housemates(self.graph, name, limit).collect()]

    # -- POST /predict house histogram part (app.py:62-66) --
    def house_histogram(self, names: Sequence[str]) -> dict[str, int]:
        return {
            r["house"]: r["n"]
            for r in gq.house_histogram(self.graph, names).collect()
        }
