"""neo4j_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference property-graph application
(BeanEden/Neo4j-database): labeled-property-graph storage as node/edge
DataFrames, Cypher-equivalent pattern-match queries expressed as Catalyst
logical plans, rule-based ETL as set-based joins, a graph-feature ML
pipeline on Spark ML, and — beyond the reference — large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) plus Structured Streaming over event tables.

Design rules (see SURVEY.md §7):
- DataFrame/SQL only; no RDDs; no row-at-a-time Python UDFs in hot paths.
- Broadcast provably-small sides; AQE on; explicit skew handling for
  quadratic self-joins.
- Every operator oracle-checkable against ANSI SQL where semantics allow.
"""

from neo4j_database_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
