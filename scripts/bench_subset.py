"""Time a subset of bench HEADLINE queries with bench.py's exact
methodology (noop sink, best-of-3, calibration) — for interleaved
before/after A/Bs during the r09 optimization round.

Usage: python scripts/bench_subset.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from neo4j_database_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("bench-subset")
    qs = entrymod.queries()

    from neo4j_database_spark.graph import store

    out_dir = store._store_dir(sf_dir)
    store.build_store(spark, sf_dir, out_dir)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cal = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        li.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        ).write.mode("overwrite").format("noop").save()
        cal = min(cal, time.perf_counter() - t0)

    for name in names:
        best = float("inf")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: best {best:.3f}s  runs {runs}", flush=True)
    print(f"calibration: {cal:.3f}s  load {os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
