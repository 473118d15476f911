"""Embedding clustering: seed-pinned KMeans over the vector column.

The trained-codebook counterpart to similarity.ivf_knn's fixed coarse
quantizer: at deployment the KMeans centers become the IVF lists
(assignment = partition column at write time). Spark ML KMeans
distributes Lloyd iterations; vectors convert via array_to_vector
(JVM-side, no Python)."""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_database_spark.catalog import load_table

SEED = 42


def kmeans_clusters(
    spark: SparkSession, sf_dir: str, k: int = 8, max_iter: int = 20
) -> DataFrame:
    """Cluster embeddings; return per-cluster sizes + label purity.

    Output is aggregate (cluster_id, n, majority_label, n_majority) —
    compact and stable for a rows-only check; exact centroids are
    float-iteration-order dependent and deliberately not exposed.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=k, seed=SEED, maxIter=max_iter).fit(emb)
    assigned = model.transform(emb).select(
        "vec_id", "label", F.col("prediction").alias("cluster_id")
    )
    per_cluster_label = assigned.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    majority = (
        per_cluster_label.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
    return sizes.join(majority, "cluster_id").orderBy("cluster_id")


LLOYD_SCALE = 1_000_000_000


def lloyd_clusters(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Deterministic Lloyd k-means — the exact-oracle-checkable audit
    twin of ``kmeans_clusters`` (whose Spark-ML k-means|| init and
    float iteration order are engine-specific, hence rows-only).

    Determinism contract (the pagerank/betweenness recipe applied to an
    iterative ML fit):
    - init: the embeddings of the ``k`` smallest vec_ids, components
      nano-quantized round(x*1e9) -> BIGINT (Spark round and DuckDB
      round both half-away-from-zero on BOTH signs — verified r06);
    - assignment: squared-L2 argmin where each per-dimension term is
      quantized ``round(((x-c)*(x-c))*1e9) -> BIGINT`` and summed as
      integers (order-independent); ties break to the lowest centroid
      id. The centroid double c = cn/1e9 is one correctly-rounded IEEE
      division on both engines;
    - update: per-dimension integer mean ``sum(round(x*1e9)) div n``
      (both engines truncate integer division toward zero — verified
      r06). Clusters that empty drop from the codebook (deterministic
      on both sides; with k << n this does not occur on this data);
    - ``iters`` assignment rounds with updates between (output = the
      final assignment).

    Scale shape: assignment is map-side against a k*d literal codebook
    (driver-sized, the similarity.py pattern); each update is ONE
    groupBy emitting k*d rows. Per-vector work is an interpreted
    zip_with fold — acceptable because it is O(k*d) per row ONCE per
    iteration, and exactness (the audit contract) is the point; the
    production-scale fit is kmeans_clusters' Spark-ML path.

    Output mirrors kmeans_clusters: (cluster_id, n, majority_label,
    n_majority) per cluster.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    # init codebook: quantize IN Spark so the rounding rule is the
    # engine's (Python's round() is banker's and would diverge)
    init = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            "vec_id",
            F.expr(
                f"transform(v, x -> CAST(round(x * CAST({LLOYD_SCALE} AS"
                " DOUBLE)) AS BIGINT))"
            ).alias("cn"),
        )
        .collect()
    )
    cents = {
        i: [int(x) for x in r["cn"]] for i, r in enumerate(init)
    }

    def assign(frame, codebook):
        dists = []
        for cid in sorted(codebook):
            cvals = F.array(
                *[F.lit(cn / LLOYD_SCALE) for cn in codebook[cid]]
            )
            term = (
                f"zip_with(v, c{cid}, (x, y) -> CAST(round(((x - y) *"
                f" (x - y)) * CAST({LLOYD_SCALE} AS DOUBLE)) AS BIGINT))"
            )
            frame = frame.withColumn(f"c{cid}", cvals)
            dists.append(
                F.struct(
                    F.expr(
                        f"aggregate({term}, CAST(0 AS BIGINT),"
                        " (acc, t) -> acc + t)"
                    ).alias("d"),
                    F.lit(cid).alias("j"),
                )
            )
        return frame.withColumn(
            "cluster_id", F.array_min(F.array(*dists))["j"]
        ).drop(*[f"c{cid}" for cid in sorted(codebook)])

    assigned = None
    for t in range(iters):
        assigned = assign(emb, cents)
        if t < iters - 1:
            rows = (
                assigned.select(
                    "cluster_id", F.posexplode("v").alias("pos", "val")
                )
                .groupBy("cluster_id", "pos")
                .agg(
                    F.sum(
                        F.round(
                            F.col("val") * F.lit(float(LLOYD_SCALE))
                        ).cast("long")
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select("cluster_id", "pos", F.expr("s div n").alias("cn"))
                .collect()
            )
            dims = len(next(iter(cents.values())))
            nxt: dict[int, list[int]] = {}
            for r in rows:
                nxt.setdefault(r["cluster_id"], [0] * dims)[
                    r["pos"]
                ] = int(r["cn"])
            cents = nxt

    from pyspark.sql.window import Window as W

    per_label = assigned.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    majority = (
        per_label.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
    return sizes.join(majority, "cluster_id").orderBy("cluster_id")
