"""Stage decomposition of the d=2 deletion route at x16 (r09).

The width probe showed partition width is NOT the lever (parts_mult
8 vs 1: warm 273 vs 295 s). This probe times cumulative prefixes of
the pipeline so the per-stage cost falls out by subtraction:

  gen      variant explode + xxhash64 + narrow projection (count only)
  join     + candidate self-join with len/bag filters (pre-dedup count)
  dedup    + pair dropDuplicates (count)
  full     + string re-attach + banded levenshtein + final distinct

Usage: python scripts/er_deletion_decomp_probe.py [mult] [stage...]
Each stage in a fresh JVM is overkill here — one JVM, stages in
order, first a JIT warm pass of `gen` (its second reading is the one
to use).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "110g")

from pyspark.sql import functions as F


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    stages = sys.argv[2:] or ["gen", "gen", "join", "dedup", "full"]

    from bench_scale import build_er_d2_input, load_avgs, time_noop

    from neo4j_database_spark.operators import er
    from neo4j_database_spark.session import get_spark

    spark = get_spark("er-deletion-decomp-probe")
    path = build_er_d2_input(spark, "/root/testdata/sf0.1", mult)
    cust = spark.read.parquet(path)
    base = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    )
    print(f"load_start: {load_avgs()}", flush=True)

    def keyed_frame():
        variants = F.concat(
            F.array(F.col("s")),
            F.expr(
                "CASE WHEN length(s) = 0 THEN array() ELSE"
                " transform(sequence(1, length(s)),"
                " i -> concat(left(s, i-1), substr(s, i+1)))"
                " END"
            ),
            F.expr(
                "CASE WHEN length(s) < 2 THEN array() ELSE"
                " flatten(transform(sequence(1, length(s) - 1),"
                " i -> transform(sequence(i + 1, length(s)),"
                " j -> concat(left(s, i-1), substring(s, i+1, j-i-1),"
                " substr(s, j+1)))))"
                " END"
            ),
        )
        return base.select(
            "id",
            F.length("s").alias("len"),
            er._bag_signature(F.col("s")).alias("sig"),
            F.explode(variants).alias("v"),
        ).select(F.xxhash64("v").alias("k"), "id", "len", "sig")

    for stage in stages:
        t0 = time.perf_counter()
        if stage == "gen":
            n = keyed_frame().count()
        elif stage == "join":
            n = er._candidates_on(
                keyed_frame(), 2, bag=True, salt=1,
                parts_mult=er.DELETION_PARTS_MULT,
            ).count()
        elif stage == "dedup":
            cand = er._candidates_on(
                keyed_frame(), 2, bag=True, salt=1,
                parts_mult=er.DELETION_PARTS_MULT,
            )
            from neo4j_database_spark.session import shuffle_partitions

            n = (
                cand.repartition(
                    shuffle_partitions(spark) * er.DELETION_PARTS_MULT,
                    "id_a",
                    "id_b",
                )
                .dropDuplicates(["id_a", "id_b"])
                .count()
            )
        elif stage == "full":
            df = er.edit_distance_pairs(
                cust, "c_custkey", "c_name", max_dist=2,
                strategy="deletion",
            )
            n = None
            t0 = time.perf_counter()
            time_noop(df)
            n = "noop"
        else:
            raise SystemExit(f"unknown stage {stage}")
        print(
            f"x{mult} {stage}: {time.perf_counter() - t0:.2f}s n={n} "
            f"load={load_avgs()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
