"""Measure the d=2 deletion-vs-gram routing crossover (r09).

VERDICT r08 item 3 asks for the routing rule to be MEASURED, not
guessed: the deletion-neighborhood generator emits 1 + L + C(L, 2)
variant keys per string (quadratic in key length) while the gram
prefix emits q*d+1, so deletion must lose at some length even on
corpora where its candidate quality is no better. This probe times
both strategies on DIVERSE corpora (where gram blocking is at its
best — candidate buckets stay small, so the crossover is purely the
variant-generation overhead) across key lengths; the templated case
needs no probe, deletion wins it by construction (see er.py module
docstring and the er_edjoin_d2 replica cells).

DELETION_LEN_CEILING is set at the measured DIVERSE crossover; the
numbers land in SCALE_PROBE.md r09 and the er.py constant comment.

Usage: python scripts/er_route_probe.py [n_strings]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from neo4j_database_spark.operators.er import edit_distance_pairs
from neo4j_database_spark.session import get_spark

LENGTHS = (16, 24, 32, 40, 48, 64)


def templated_corpus(spark, n: int, length: int):
    """n strings sharing one (length - 10)-char template, distinguished
    by a 10-char digit region (zero-padded id) — the boilerplate-heavy
    shape where gram blocking collapses (every string's rarest grams
    are shared with all template mates). 1-in-20 near-dups as below."""
    template = "".join(chr(97 + (i * 7) % 26) for i in range(length - 10))
    df = spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit(template), F.format_string("%010d", F.col("id"))
        ).alias("s"),
    )
    dup = df.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + 1_000_000_000).alias("id"),
        F.concat(F.expr("substring(s, 1, length(s) - 1)"), F.lit("Z")).alias(
            "s"
        ),
    )
    return df.unionByName(dup).localCheckpoint()


def diverse_corpus(spark, n: int, length: int):
    """n strings of the given length with diverse gram content: a
    base-26 rendering of xxhash-mixed ids, plus a 1-in-20 near-dup
    (single substitution) so the true pair set is non-empty."""
    df = spark.range(n).select(
        F.col("id"),
        F.concat(
            *[
                F.substring(
                    F.base64(
                        F.sha2(
                            F.concat(
                                F.col("id").cast("string"), F.lit(f"-{i}")
                            ),
                            256,
                        )
                    ),
                    1,
                    32,
                )
                for i in range((length // 32) + 1)
            ]
        ).substr(1, length).alias("s"),
    )
    dup = (
        df.filter(F.col("id") % 20 == 0)
        .select(
            (F.col("id") + 1_000_000_000).alias("id"),
            F.concat(F.lit("Z"), F.expr("substring(s, 2)")).alias("s"),
        )
    )
    return df.unionByName(dup).localCheckpoint()


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    kinds = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "diverse", "templated",
    ]
    spark = get_spark("er-route-probe")
    print(f"load avg pre: {os.getloadavg()}", flush=True)
    for kind in kinds:
        make = diverse_corpus if kind == "diverse" else templated_corpus
        for length in LENGTHS:
            corpus = make(spark, n, length)
            rows = {}
            for strat in ("deletion", "gram"):
                runs = [
                    time_noop(
                        edit_distance_pairs(
                            corpus, "id", "s", max_dist=2, strategy=strat
                        )
                    )
                    for _ in range(3)
                ]
                rows[strat] = (runs[0], min(runs[1:]))
            pairs = edit_distance_pairs(
                corpus, "id", "s", max_dist=2, strategy="gram"
            ).count()
            print(
                f"{kind:9s} L={length:4d} n={n} pairs={pairs}  "
                f"deletion cold={rows['deletion'][0]:.2f} "
                f"warm={rows['deletion'][1]:.2f}  "
                f"gram cold={rows['gram'][0]:.2f} "
                f"warm={rows['gram'][1]:.2f}",
                flush=True,
            )
    print(f"load avg post: {os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
