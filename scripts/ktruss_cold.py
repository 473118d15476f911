"""Fresh-session k-truss cold-start measurement (VERDICT r06 item 4).

Reproduces the judge's measurement shape: a brand-new SparkSession
whose FIRST job is the full g_ktruss entry path (graph build from
parquet + edge-iterator truss peel) at sf0.1 — i.e. what an
interactive user pays on first call, including JVM/codegen warmup,
the quadratic FRIEND_OF build, and the initial edge checkpoint.
Prints cold (first call) and warm (second call, same session).

Usage: python scripts/ktruss_cold.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from neo4j_database_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ktruss-cold")

    from neo4j_database_spark.graph.algorithms import ktruss_edges
    from neo4j_database_spark.graph.model import build_graph

    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        g = build_graph(spark, sf_dir)
        n = ktruss_edges(g).count()
        print(
            f"ktruss sf0.1 {label} (fresh-session first call includes "
            f"JVM/codegen + graph build): {time.perf_counter() - t0:.1f}s "
            f"rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
