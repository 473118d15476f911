"""A/B: g_hits small-mode static edge frame at scan width (current) vs
width-pinned (VERDICT r09 item 5 / r10). Store-backed, interleaved."""
import sys, time, os

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from neo4j_database_spark.graph import algorithms as galg
from neo4j_database_spark.graph.store import load_graph
from neo4j_database_spark.session import get_spark, shuffle_partitions

spark = get_spark("hits-pin-r10")
g = load_graph(spark, "/root/testdata/sf0.1")
width = shuffle_partitions(spark)

import neo4j_database_spark.graph.algorithms as A

orig_ckpt = None


def hits_pinned(g):
    """galg.hits with the small-mode edge checkpoint width-pinned —
    monkeypatched via a wrapper copy of the function body would drift;
    instead temporarily patch DataFrame.localCheckpoint? Too blunt.
    Inline copy of hits() with the one-line pin:"""
    nodes = g.persons.select("id").localCheckpoint()
    n = nodes.count()
    assert n <= galg.BROADCAST_NODE_LIMIT
    edges = g.edges.select("src", "dst")
    e = edges.repartition(width, "src").localCheckpoint()
    e_src = e_dst = e

    def _step(scores, col, e, join_key, out_key, out):
        side = F.broadcast(scores)
        raw = (
            e.join(side, F.col(join_key) == scores.id)
            .groupBy(F.col(out_key).alias("id"))
            .agg(
                (
                    F.sum(F.round(F.col(col) * galg.CONTRIB_SCALE).cast("long")).cast("double")
                    / F.lit(galg.CONTRIB_SCALE)
                ).alias("raw")
            )
        )
        raw = F.broadcast(raw)
        full = nodes.join(raw, "id", "left").select(
            "id", F.coalesce(F.col("raw"), F.lit(0.0)).alias("raw")
        )
        norm = full.groupBy().agg(
            F.sqrt(
                F.sum(F.round(F.col("raw") * F.col("raw") * galg.CONTRIB_SCALE).cast("long")).cast("double")
                / F.lit(galg.CONTRIB_SCALE)
            ).alias("nrm")
        )
        return full.crossJoin(F.broadcast(norm)).select(
            "id", (F.col("raw") / F.col("nrm")).alias(out)
        )

    hub = nodes.select("id", F.lit(1.0 / n).alias("hub"))
    auth = None
    for it in range(5):
        cut = it % 2 == 1 or it == 4
        auth = _step(hub, "hub", e_src, "src", "dst", "auth")
        if cut:
            auth = auth.localCheckpoint()
        hub = _step(auth, "auth", e_dst, "dst", "src", "hub")
        if cut:
            hub = hub.localCheckpoint()
    return (
        g.persons.select("id", "name")
        .join(hub, "id")
        .join(auth, "id")
        .select("name", "hub", F.col("auth").alias("authority"))
        .orderBy(F.desc("authority"), F.desc("hub"), F.asc("name"))
    )


variants = {
    "hits_cur": lambda: galg.hits(g),
    "hits_pin": lambda: hits_pinned(g),
}
import hashlib
hashes = {}
for k, fn in variants.items():
    rows = fn().collect()
    hashes[k] = hashlib.md5(
        "\n".join(f"{r['name']}|{r['hub']!r}|{r['authority']!r}" for r in rows).encode()
    ).hexdigest()
print("hashes:", hashes, flush=True)
assert len(set(hashes.values())) == 1

times = {k: [] for k in variants}
for _ in range(3):
    for k, fn in variants.items():
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        times[k].append(round(time.perf_counter() - t0, 2))
for k, ts in times.items():
    print(f"{k}: min {min(ts):.2f}s  runs {ts}", flush=True)
print("load", os.getloadavg())
