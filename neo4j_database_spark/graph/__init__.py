"""Property-graph layer: node/edge DataFrames + pattern-match queries.

GraphFrames-convention representation (nodes DataFrame + edges DataFrame);
all traversals are Catalyst joins, per BASELINE.json's "GraphX for
analytics, not OLTP traversal" directive.
"""

from neo4j_database_spark.graph.model import GraphModel, build_graph

__all__ = ["GraphModel", "build_graph"]
