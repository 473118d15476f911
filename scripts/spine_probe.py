"""Spine probe (VERDICT r05 item 7): raw vs bucketed-spine plans for
the three routed twins (Q3 top_unshipped_orders, Q10
returned_item_losses, Q18 big_volume_customers) on 1x/16x/64x
replicated facts.

The claim under test is the Q10 crossover documented in
queries/relational.py::returned_item_losses_bucketed: at sf0.1 the raw
plan TIES the spine because the quarter-filtered orders side still
broadcasts; the spine should win exactly when the filtered fact side
outgrows the broadcast threshold. The 16x/64x cells measure that claim
instead of asserting it.

Reuses scale_probe's replicated fact parquet (disjoint orderkey /
custkey shifts) and adds a matching replicated CUSTOMER table — the
fact replicas shift o_custkey by 100M per copy, so an unreplicated
customer would silently drop 15/16 of the join work. The spine build
(one bucketed write per table per mult) is timed and reported
separately: it is the one-time cost the layout amortizes.

Usage: python scripts/spine_probe.py [sf_dir] [mults...]
Appends a markdown row block to stdout; copy into SCALE_PROBE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_database_spark.catalog import load_table
from neo4j_database_spark.session import get_spark
from scale_probe import replicate

BUCKETS = 32


def bench(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 16, 64]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "110g")
    spark = get_spark("spine-probe")
    base = "/tmp/scale_probe"
    from neo4j_database_spark.queries.relational import (
        _big_volume,
        _returned_losses,
        _top_unshipped,
    )
    from neo4j_database_spark.sources.io import write_bucketed

    nation = load_table(spark, "nation", sf_dir)
    for mult in mults:
        # fact replicas: reuse scale_probe's when present (x16; x64
        # lives under x64_rel), else build
        d = os.path.join(base, f"x{mult}" if mult != 64 else "x64_rel")
        if mult == 1:
            li = load_table(spark, "lineitem", sf_dir)
            orders = load_table(spark, "orders", sf_dir)
            cust = load_table(spark, "customer", sf_dir)
        else:
            for t, key in (
                ("lineitem", ["l_orderkey"]),
                ("orders", ["o_orderkey", "o_custkey"]),
            ):
                p = os.path.join(d, t)
                if not os.path.exists(p):
                    replicate(
                        load_table(spark, t, sf_dir), mult, key, 100_000_000
                    ).write.mode("overwrite").parquet(p)
            cp = os.path.join(d, "customer")
            if not os.path.exists(os.path.join(cp, "_SUCCESS")):
                replicate(
                    load_table(spark, "customer", sf_dir),
                    mult,
                    ["c_custkey"],
                    100_000_000,
                ).write.mode("overwrite").parquet(cp)
            li = spark.read.parquet(os.path.join(d, "lineitem"))
            orders = spark.read.parquet(os.path.join(d, "orders"))
            cust = spark.read.parquet(cp)

        # one-time spine build over the replicated facts, timed
        names = {}
        t0 = time.perf_counter()
        for t, key, frame in (
            ("orders", "o_orderkey", orders),
            ("lineitem", "l_orderkey", li),
        ):
            name = f"bkt_probe_x{mult}_{t}_{BUCKETS}"
            names[t] = name
            if not spark.catalog.tableExists(name):
                write_bucketed(
                    frame.repartition(BUCKETS, F.col(key)),
                    table=name,
                    path=os.path.join("/tmp/scale_probe/warehouse", name),
                    bucket_by=key,
                    buckets=BUCKETS,
                    sort_by=key,
                )
        build = round(time.perf_counter() - t0, 2)
        b_orders = spark.table(names["orders"]).hint("merge")
        b_li = spark.table(names["lineitem"])

        cust_bldg = cust.filter(F.col("c_mktsegment") == "BUILDING")
        cells = {
            "spine_build": build,
            "q3_raw": bench(lambda: _top_unshipped(orders, li, cust_bldg, 10)),
            "q3_spine": bench(
                lambda: _top_unshipped(b_orders, b_li, cust_bldg, 10)
            ),
            "q10_raw": bench(
                lambda: _returned_losses(li, orders, cust, nation, 20)
            ),
            "q10_spine": bench(
                lambda: _returned_losses(b_li, b_orders, cust, nation, 20)
            ),
            "q18_raw": bench(lambda: _big_volume(li, orders, cust, 250)),
            "q18_spine": bench(lambda: _big_volume(b_li, b_orders, cust, 250)),
        }
        print(f"x{mult}: {cells}", flush=True)


if __name__ == "__main__":
    main()
