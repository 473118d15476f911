"""Tests for the Bloom semi-join runtime filter (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_database_spark.operators.bloom import (
    bloom_probe,
    bloom_semi_join,
    build_bloom,
)


def _frames(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("payload")
    )
    # every 10th key is "in" — selective dim
    keys = spark.range(0, 5000, 10).select(F.col("id").alias("k"))
    return fact, keys


def test_probe_has_no_false_negatives(spark):
    fact, keys = _frames(spark)
    bloom = build_bloom(keys, "k")
    candidates = {
        r.k for r in bloom_probe(fact, bloom, "k").select("k").collect()
    }
    true_keys = {r.k for r in keys.collect()}
    assert true_keys <= candidates  # Bloom never drops a present key


def test_probe_fpr_bounded(spark):
    fact, keys = _frames(spark)
    bloom = build_bloom(keys, "k", m_bits=1 << 16, n_hashes=3)
    n_cand = bloom_probe(fact, bloom, "k").count()
    n_true = keys.count()
    n_absent = fact.count() - n_true
    fpr = (n_cand - n_true) / n_absent
    # 500 keys in 2^16 bits with k=3: theoretical fpr ~ (1-e^(-3*500/65536))^3
    # ~ 1e-5; allow two orders of magnitude slack for hash imperfection
    assert fpr < 0.01


def test_semi_join_exactness(spark):
    fact, keys = _frames(spark)
    got = bloom_semi_join(fact, keys, "k").orderBy("k").collect()
    want = fact.join(keys, "k", "left_semi").orderBy("k").collect()
    assert got == want


def test_semi_join_tiny_filter_still_exact(spark):
    # Deliberately undersized filter => high FPR; exact join must still
    # remove every false positive.
    fact, keys = _frames(spark)
    got = bloom_semi_join(fact, keys, "k", m_bits=256, n_hashes=2)
    want = fact.join(keys, "k", "left_semi")
    assert got.orderBy("k").collect() == want.orderBy("k").collect()


def test_probe_is_map_side_only(spark):
    # Probing against a MATERIALIZED bitmap (the cross-job-reuse shape)
    # must shuffle nothing: broadcast of the one-row bitmap only.
    fact, keys = _frames(spark)
    bitmap_rows = build_bloom(keys, "k").collect()
    bloom = spark.createDataFrame(bitmap_rows)
    plan = bloom_probe(fact, bloom, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan


# ---------------- point_in_interval_join (operators/interval.py) ----------------

from neo4j_database_spark.operators.interval import point_in_interval_join


def _interval_frames(spark):
    import random

    rnd = random.Random(7)
    ivls = [
        (i, s, s + rnd.randint(1, 500))
        for i, s in ((i, rnd.randint(0, 5000)) for i in range(80))
    ]
    pts = [(j, rnd.randint(-100, 6000)) for j in range(400)]
    intervals = spark.createDataFrame(ivls, "ivl_id long, s long, e long")
    points = spark.createDataFrame(pts, "pt_id long, t long")
    return points, intervals


def _brute(points, intervals):
    return (
        points.crossJoin(intervals)
        .filter((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .select("pt_id", "ivl_id")
        .orderBy("pt_id", "ivl_id")
        .collect()
    )


def test_bucketed_matches_bruteforce(spark):
    points, intervals = _interval_frames(spark)
    want = _brute(points, intervals)
    for width in (64, 100, 1000):
        got = (
            point_in_interval_join(points, intervals, "t", "s", "e",
                                   bucket_width=width)
            .select("pt_id", "ivl_id")
            .orderBy("pt_id", "ivl_id")
            .collect()
        )
        assert got == want, f"width={width}"


def test_bucketed_no_duplicate_pairs(spark):
    points, intervals = _interval_frames(spark)
    res = point_in_interval_join(points, intervals, "t", "s", "e",
                                 bucket_width=50)
    n = res.count()
    n_distinct = res.select("pt_id", "ivl_id").distinct().count()
    assert n == n_distinct


def test_half_open_boundaries(spark):
    points = spark.createDataFrame([(1, 10), (2, 20), (3, 9)], "pt_id long, t long")
    intervals = spark.createDataFrame([(100, 10, 20)], "ivl_id long, s long, e long")
    got = {
        r.pt_id
        for r in point_in_interval_join(
            points, intervals, "t", "s", "e", bucket_width=16
        ).collect()
    }
    assert got == {1}  # start inclusive, end exclusive


def test_equi_key_path_matches_bruteforce(spark):
    points, intervals = _interval_frames(spark)
    points = points.withColumn("k", F.col("pt_id") % 5)
    intervals = intervals.withColumn("k", F.col("ivl_id") % 5)
    want = (
        points.crossJoin(intervals.select(F.col("k").alias("k2"), "ivl_id", "s", "e"))
        .filter((F.col("k") == F.col("k2"))
                & (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .select("pt_id", "ivl_id").orderBy("pt_id", "ivl_id").collect()
    )
    got = (
        point_in_interval_join(points, intervals.select("k", "ivl_id", "s", "e"),
                               "t", "s", "e", equi_keys=["k"])
        .select("pt_id", "ivl_id").orderBy("pt_id", "ivl_id").collect()
    )
    assert got == want


def test_interval_overlap_join_bucketed_equals_bruteforce(spark):
    """Bucketed exactly-once path ≡ the plain non-equi join across
    bucket widths, including intervals spanning many buckets."""
    from neo4j_database_spark.operators.interval import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 95, 205), (4, 300, 301)],
        "lid long, a_start long, a_end long",
    )
    right = spark.createDataFrame(
        [(10, 9, 12), (11, 0, 400), (12, 200, 210), (13, 6, 9)],
        "rid long, b_start long, b_end long",
    )
    want = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, ("a_start", "a_end"), ("b_start", "b_end")
        ).collect()
    }
    # half-open sanity: [5,6) does not touch [6,9)
    assert (2, 13) not in want
    assert (1, 13) in want
    for w in (1, 7, 100, 1000):
        got = [
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left,
                right,
                ("a_start", "a_end"),
                ("b_start", "b_end"),
                bucket_width=w,
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicates at width {w}"
        assert set(got) == want, f"mismatch at width {w}"


def test_interval_overlap_join_equi_key_path(spark):
    from neo4j_database_spark.operators.interval import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("u1", 0, 10), ("u2", 0, 10)], "k string, a_start long, a_end long"
    )
    right = spark.createDataFrame(
        [("u1", 5, 20), ("u2", 50, 60)], "k string, b_start long, b_end long"
    )
    rows = interval_overlap_join(
        left, right, ("a_start", "a_end"), ("b_start", "b_end"),
        equi_keys=["k"],
    ).collect()
    assert [(r.k,) for r in rows] == [("u1",)]


def test_skyline_exact_on_hand_case(spark):
    from neo4j_database_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [
            (1, 10, 5.0),   # dominated by 3 (size 10 cheaper)
            (2, 20, 9.0),   # survivor (biggest)
            (3, 10, 3.0),   # survivor (cheapest at size 10)
            (4, 5, 3.0),    # dominated by 3 (same price, smaller)
            (5, 20, 9.0),   # duplicate of 2: neither dominates → both stay
            (6, 1, 1.0),    # survivor (globally cheapest)
        ],
        "id long, size int, price double",
    )
    got = {
        r.id
        for r in skyline(df, maximize=["size"], minimize=["price"]).collect()
    }
    assert got == {2, 3, 5, 6}


def test_skyline_invariants_random(spark):
    from neo4j_database_spark.operators.skyline import skyline

    import random

    rnd = random.Random(7)
    rows = [
        (i, rnd.randint(0, 20), float(rnd.randint(0, 50)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, size int, price double")
    sky = skyline(df, maximize=["size"], minimize=["price"]).collect()
    sky_set = {(r.size, r.price) for r in sky}
    all_rows = [(s, p) for _, s, p in rows]

    def dominated(a, by):
        return (
            by[0] >= a[0] and by[1] <= a[1] and (by[0] > a[0] or by[1] < a[1])
        )

    # no survivor is dominated; every non-survivor is dominated
    for a in sky_set:
        assert not any(dominated(a, b) for b in all_rows)
    survivors_ids = {r.id for r in sky}
    # ties never dominate, so duplicate criterion-vectors all survive;
    # every true non-survivor must be strictly dominated by a survivor
    for i, s, p in rows:
        if i not in survivors_ids:
            assert any(dominated((s, p), b) for b in sky_set), (i, s, p)
