"""KMV distinct sketch + intersection estimator (operators/sketch.py).

Cross-engine exactness of the integer estimator is the oracle's job
(events_kmv_estimates / events_kmv_audit, green at sf0.001/0.01/0.1); these pin the
Spark-side invariants: partitioning independence, the exhaustive-branch
degradation to exact counts, and sketch size bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_database_spark.operators.sketch import (
    kmv_intersection_estimates,
    kmv_sketch,
)


def _toy(spark, n_per=40, overlap=10):
    # groups A and B share `overlap` users
    rows = [("A", i) for i in range(n_per)] + [
        ("B", i) for i in range(n_per - overlap, 2 * n_per - overlap)
    ]
    return spark.createDataFrame(rows, "t string, u long")


def test_exhaustive_branch_is_exact(spark):
    df = _toy(spark)
    out = kmv_intersection_estimates(
        df, "t", "u", k=256, include_exact=True
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert r["exact_common_users"] == 10
    # both sketches exhaustive (40 < 256) → estimate degrades to exact
    assert r["est_common_users"] == 10


def test_sketch_size_and_partitioning_independence(spark):
    df = _toy(spark, n_per=500, overlap=100)
    sk = kmv_sketch(df, "t", "u", k=64)
    sizes = {
        r["g"]: r["n"]
        for r in sk.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"A": 64, "B": 64}
    base = [
        tuple(r)
        for r in kmv_intersection_estimates(
            df, "t", "u", k=64, include_exact=True
        ).collect()
    ]
    shuffled = [
        tuple(r)
        for r in kmv_intersection_estimates(
            df.repartition(13, "u"), "t", "u", k=64, include_exact=True
        ).collect()
    ]
    assert base == shuffled  # sketch is a pure function of the data
    # estimation branch: sanity-band check (k=64 on 900 distinct union;
    # the deterministic fixture gives a stable, roughly-right estimate)
    est, exact = base[0][2], base[0][3]
    assert exact == 100
    assert 0 < est < 500


def test_merge_equals_sketch_of_union(spark):
    """The lossless-merge property: merging per-slice sketches equals
    sketching the concatenated data — per-partition / per-day sketches
    combine without revisiting base data. Also idempotent: re-merging a
    sketch with itself is a no-op."""
    from neo4j_database_spark.operators.sketch import kmv_merge

    d1 = _toy(spark, n_per=300, overlap=50)
    d2 = spark.createDataFrame(
        [("A", i) for i in range(900, 1200)]
        + [("C", i) for i in range(150)],
        "t string, u long",
    )
    k = 64
    merged = kmv_merge(
        kmv_sketch(d1, "t", "u", k), kmv_sketch(d2, "t", "u", k), k
    )
    direct = kmv_sketch(d1.unionByName(d2), "t", "u", k)
    m = sorted(tuple(r) for r in merged.collect())
    d = sorted(tuple(r) for r in direct.collect())
    assert m == d
    sk = kmv_sketch(d1, "t", "u", k)
    again = sorted(tuple(r) for r in kmv_merge(sk, sk, k).collect())
    assert again == sorted(tuple(r) for r in sk.collect())


def test_null_values_excluded_from_sketch(spark):
    """ADVICE r05: md5(NULL) is NULL and the engines disagree on where
    a NULL hash sorts (Spark windows NULLS FIRST, DuckDB ORDER BY NULLS
    LAST) — the sketch must be identical with or without NULL values."""
    df = _toy(spark)
    with_null = df.unionByName(
        spark.createDataFrame([("A", None), ("B", None)], "t string, u long")
    )
    a = sorted(tuple(r) for r in kmv_sketch(df, "t", "u", k=16).collect())
    b = sorted(
        tuple(r) for r in kmv_sketch(with_null, "t", "u", k=16).collect()
    )
    assert a == b
    assert all(h is not None for _, h in a)


def test_product_path_drops_exact_column(spark):
    """VERDICT r05 item 3: the default (production) path must not carry
    the exact-intersection audit column or its full-data self-join."""
    df = _toy(spark)
    out = kmv_intersection_estimates(df, "t", "u", k=64)
    assert out.columns == ["type_a", "type_b", "est_common_users"]
    audit = kmv_intersection_estimates(df, "t", "u", k=64, include_exact=True)
    prod = {(r[0], r[1]): r[2] for r in out.collect()}
    aud = {(r[0], r[1]): r[2] for r in audit.collect()}
    assert prod == aud  # audit never changes the estimate
