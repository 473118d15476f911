"""Source/sink helpers: schema-explicit readers and layout-aware writers."""

from neo4j_database_spark.sources.io import (
    read_csv,
    read_jsonl,
    write_partitioned,
)

__all__ = ["read_csv", "read_jsonl", "write_partitioned"]
