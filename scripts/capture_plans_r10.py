"""Capture .explain("formatted") for every bench HEADLINE query into
plans/r10/<query>_<tag>.txt (tag = before/after), the r10 optimization-
round evidence artifact.

Iterative algorithms (pagerank/cc) execute their superstep loop eagerly
at construction; the captured plan is the FINAL returned frame (post-
loop join) — the loop shape is documented in OPTIMIZATION_r10.md and
ARCHITECTURE.md instead. Capturing still runs the loop, so this script
doubles as a smoke test.

Usage: python scripts/capture_plans_r10.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from neo4j_database_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture-r10")
    out_dir = "/root/repo/plans/r10"
    os.makedirs(out_dir, exist_ok=True)

    import bench

    names = [n for n in bench.HEADLINE if not only or n in only]
    qs = entrymod.queries()
    # the store must exist for graph queries
    from neo4j_database_spark.graph import store

    store.build_store(spark, sf_dir, store._store_dir(sf_dir))

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
