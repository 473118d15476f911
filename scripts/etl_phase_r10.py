"""graph_etl_build edges-phase breakdown at sf0.1 (r10): how much of the
~3.7 s edges phase is rule-join generation vs layout exchange vs sorted
partitioned write. Also times a FUSED single-self-join variant of the
friend+family rules (VERDICT r09 item 4) for comparison."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from neo4j_database_spark.session import get_spark, shuffle_partitions
from neo4j_database_spark.graph.model import (
    build_edges, persons_df, friend_edges, family_edges, enemy_edges,
    romance_edges, _family_key,
)

spark = get_spark("etl-phase-r10")
sf = "/root/testdata/sf0.1"
persons = persons_df(spark, sf).cache()
persons.count()
width = shuffle_partitions(spark)


def t(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best*1000:8.0f} ms", flush=True)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def fused_ff(persons):
    """friend+family through ONE keyed self-join: explode each person to
    (kind, key) rows, join on (kind, key)."""
    def keyed(side):
        p = persons.select(
            F.col("id").alias(f"{side}"), F.col("name").alias(f"{side}_name"),
            "house", _family_key(F.col("name")).alias("fam"),
        )
        return p.select(
            f"{side}", f"{side}_name",
            F.explode(
                F.array_compact(F.array(
                    F.when(F.col("house").isNotNull(),
                           F.concat(F.lit("H|"), F.col("house"))),
                    F.concat(F.lit("F|"), F.col("fam")),
                ))
            ).alias("k"),
        )
    a = keyed("src")
    b = keyed("dst")
    return (
        a.join(b, "k")
        .filter(F.col("src_name") < F.col("dst_name"))
        .select(
            "src", "dst",
            F.when(F.col("k").startswith("H|"), F.lit("FRIEND_OF"))
            .otherwise(F.lit("SAME_FAMILY")).alias("type"),
        )
    )


t("gen: friend only", lambda: noop(friend_edges(persons)))
t("gen: family only", lambda: noop(family_edges(persons)))
t("gen: enemy+romance", lambda: noop(enemy_edges(persons).unionByName(romance_edges(persons))))
t("gen: all 4 (build_edges)", lambda: noop(build_edges(persons)))
t("gen fused friend+family", lambda: noop(fused_ff(persons)))
t("gen + repartition", lambda: noop(build_edges(persons).repartition(width, "src")))
t("gen + repart + sort", lambda: noop(
    build_edges(persons).repartition(width, "src")
    .sortWithinPartitions("type", "src", "dst")))
t("full write", lambda: (
    build_edges(persons).repartition(width, "src")
    .sortWithinPartitions("type", "src", "dst")
    .write.mode("overwrite").partitionBy("type")
    .parquet("/tmp/etl_probe_edges")))
import os
print("load", os.getloadavg())
