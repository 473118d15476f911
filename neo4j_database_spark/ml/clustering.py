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
