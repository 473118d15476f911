"""Skew utilities (equivalence vs unsalted twins) and IO helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo4j_database_spark.operators import skew
from neo4j_database_spark.sources import io


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'hot' carries 90% of rows
    rows = [("hot", i) for i in range(900)] + [
        (f"k{i % 20}", i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, v int")


def test_salted_join_equivalent(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k3", "A"), ("k7", "B")], "key string, label string"
    )
    plain = skewed.join(dim, "key").select("key", "v", "label")
    salted = skew.salted_join(skewed, dim, "key", num_salts=4).select(
        "key", "v", "label"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_outer(spark, skewed):
    """right/full would emit num_salts duplicates per unmatched small-side
    key — the operator must refuse instead of silently corrupting."""
    import pytest

    dim = spark.createDataFrame([("hot", "H")], "key string, label string")
    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError):
            skew.salted_join(skewed, dim, "key", how=how)
    # left join on the big side stays exact: unmatched big rows emit once
    plain = skewed.join(dim, "key", "left").select("key", "v", "label")
    salted = skew.salted_join(skewed, dim, "key", how="left").select(
        "key", "v", "label"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark, skewed):
    salted = skewed.withColumn(
        skew.SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(4)).cast("int"),
    )
    per_salt = (
        salted.filter(F.col("key") == "hot")
        .groupBy(skew.SALT_COL)
        .count()
        .collect()
    )
    assert len(per_salt) == 4  # hot key really scatters across salts
    assert max(r["count"] for r in per_salt) < 900


def test_two_stage_count_equivalent(spark, skewed):
    plain = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    staged = {r["key"]: r["n"] for r in skew.two_stage_count(skewed, "key").collect()}
    assert staged == plain


def test_skew_profile(spark, skewed):
    prof = skew.skewed_key_profile(skewed, "key", top=3).collect()
    assert prof[0]["key"] == "hot"
    assert prof[0]["share"] == pytest.approx(0.9)


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\nnot json at all\n')
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = io.read_jsonl(spark, str(p), schema)
    assert df.filter(F.col("a").isNotNull()).count() == 2
    assert io.corrupt_rows(df).count() == 1


def test_write_partitioned_layout(spark, tmp_path, sf_dir):
    df = spark.createDataFrame(
        [(i, f"t{i % 3}", i * 1.0) for i in range(100)],
        "id long, tag string, v double",
    )
    out = str(tmp_path / "out")
    io.write_partitioned(
        df, out, partition_by=["tag"], distribute_by="id", num_files=4
    )
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert {r["tag"] for r in back.select("tag").distinct().collect()} == {
        "t0", "t1", "t2",
    }
    import glob

    assert glob.glob(f"{out}/tag=t0/*.parquet")


def test_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df = io.read_csv(spark, str(p), schema)
    assert [(r["a"], r["b"]) for r in df.orderBy("a").collect()] == [(1, "x"), (2, "y")]


def test_asof_join_hand_cases(spark):
    from neo4j_database_spark.operators.asof import asof_join

    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, 1001),
            (1, 20, 200.0, 1002),
            (1, 20, 250.0, 1003),  # tie at t=20: higher okey wins
            (2, 50, 500.0, 2001),
        ],
        "user long, ts long, price double, okey long",
    )
    events = spark.createDataFrame(
        [
            (1, 5, "e0"),   # before any order → no match
            (1, 10, "e1"),  # equal ts → inclusive match (1001)
            (1, 25, "e2"),  # most recent at t≤25 is the t=20 pair → 1003
            (2, 49, "e3"),  # before user 2's order → no match
            (3, 99, "e4"),  # user with no orders
        ],
        "user long, ts long, eid string",
    )
    inner = asof_join(
        events, orders, on="user", left_ts="ts", right_ts="ts",
        value_cols=["price", "okey"], tie_col="okey", how="inner",
    )
    got = {r["eid"]: (r["price"], r["okey"]) for r in inner.collect()}
    assert got == {"e1": (100.0, 1001), "e2": (250.0, 1003)}

    left = asof_join(
        events, orders, on="user", left_ts="ts", right_ts="ts",
        value_cols=["okey"], tie_col="okey", how="left",
    )
    lgot = {r["eid"]: r["okey"] for r in left.collect()}
    assert lgot == {"e0": None, "e1": 1001, "e2": 1003, "e3": None, "e4": None}


def test_asof_join_matches_naive(spark):
    """Union-sort carry-forward == naive inequality-join + argmax."""
    from pyspark.sql.window import Window as W

    from neo4j_database_spark.operators.asof import asof_join

    orders = spark.createDataFrame(
        [(u, t, float(u * 1000 + t), u * 100 + t)
         for u in range(5) for t in range(0, 50, 7)],
        "user long, ts long, price double, okey long",
    )
    events = spark.createDataFrame(
        [(u % 6, t, u * 50 + t) for u in range(9) for t in range(3, 60, 11)],
        "user long, ts long, eid long",
    )
    fast = asof_join(
        events, orders, on="user", left_ts="ts", right_ts="ts",
        value_cols=["okey"], tie_col="okey", how="inner",
    ).select("eid", "okey")
    j = events.alias("e").join(
        orders.alias("o"),
        (F.col("e.user") == F.col("o.user")) & (F.col("o.ts") <= F.col("e.ts")),
    )
    w = W.partitionBy("eid").orderBy(F.desc("o.ts"), F.desc("okey"))
    naive = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("eid", "okey")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_compact_parquet(spark, tmp_path):
    from neo4j_database_spark.sources.io import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(20).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 20
    n = compact_parquet(spark, src, dst, target_file_mb=256, sort_within_by="id")
    assert n == 1  # tiny data → single target-size file
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    out = spark.read.parquet(dst)
    assert out.count() == 10000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_zorder_layout_skips_on_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered files must carry tight footer min/max ranges on BOTH
    dimensions; a time-sorted layout only prunes on time."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.sources.io import write_zordered

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.pmod(F.col("ts").cast("long"), F.lit(65536)).alias("sec16"),
    )
    zdir = str(tmp_path / "zorder")
    tdir = str(tmp_path / "bytime")
    write_zordered(ev, zdir, "user_id", "sec16", n_files=8)
    ev.repartitionByRange(8, "sec16").sortWithinPartitions(
        "sec16"
    ).write.mode("overwrite").parquet(tdir)

    def avg_span(d, col):
        spans, glo_min, glo_max = [], None, None
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                j = next(
                    j
                    for j in range(rg.num_columns)
                    if rg.column(j).path_in_schema == col
                )
                stats.append(rg.column(j).statistics)
            mn = min(s.min for s in stats)
            mx = max(s.max for s in stats)
            spans.append(mx - mn)
            glo_min = mn if glo_min is None else min(glo_min, mn)
            glo_max = mx if glo_max is None else max(glo_max, mx)
        return (sum(spans) / len(spans)) / max(glo_max - glo_min, 1)

    # z-order: BOTH dims clustered (per-file span well under global)
    assert avg_span(zdir, "user_id") < 0.8
    assert avg_span(zdir, "sec16") < 0.8
    # time-sorted: time clustered but user_id spans ~everything
    assert avg_span(tdir, "sec16") < 0.3
    assert avg_span(tdir, "user_id") > 0.9


def test_orc_and_json_roundtrip(spark, sf_dir, tmp_path):
    """Source/sink matrix beyond parquet: ORC (columnar, zlib) and
    JSON-lines round-trip the nation dim byte-exactly."""
    from neo4j_database_spark.catalog import load_table

    nation = load_table(spark, "nation", sf_dir)
    want = sorted(tuple(r) for r in nation.collect())

    orc_dir = str(tmp_path / "orc")
    nation.write.mode("overwrite").option("compression", "zlib").orc(orc_dir)
    got_orc = sorted(tuple(r) for r in spark.read.orc(orc_dir).collect())
    assert got_orc == want

    json_dir = str(tmp_path / "jsonl")
    nation.write.mode("overwrite").json(json_dir)
    got_json = sorted(
        tuple(r)
        for r in spark.read.schema(nation.schema).json(json_dir).collect()
    )
    assert got_json == want


def test_count_min_never_undercounts_and_merges(spark):
    from neo4j_database_spark.operators.sketch import (
        count_min_estimate,
        count_min_sketch,
    )

    df = spark.range(0, 3000).select((F.col("id") % 37).alias("k"))
    probes = spark.range(0, 37).select(F.col("id").alias("k"))
    sketch = count_min_sketch(df, "k", d=4, w=256)
    est = {r.k: r.est_n for r in count_min_estimate(
        sketch, probes, "k", d=4, w=256).collect()}
    true = {r.k: r.n for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[k] >= true[k] for k in true)          # never undercounts
    # CM error bound: overcount ≤ e·n/w with prob ≥ 1-e^-d; data here is
    # uniform so actual collisions are far under the bound
    import math
    bound = math.e * 3000 / 256
    assert all(est[k] - true[k] <= bound for k in true)
    # mergeability: sketch(A ∪ B) == sketch(A) + sketch(B) per (seed, bucket)
    a, b = df.filter(F.col("k") < 20), df.filter(F.col("k") >= 20)
    merged = (
        count_min_sketch(a, "k", d=4, w=256)
        .unionByName(count_min_sketch(b, "k", d=4, w=256))
        .groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(df, "k", d=4, w=256)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


def test_quantile_summary_rank_bound_any_partitioning(spark):
    """The MRL-style summary's worst-case guarantee: for every quantile
    q, the estimate's true rank is within n/b of ceil(q·n) — under ANY
    partitioning — and the per-partition summary stays bounded."""
    from neo4j_database_spark.operators.sketch import (
        quantile_estimates,
        quantile_summary,
    )

    # skewed data: x^3 over a half-range, heavy ties at 0
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0.0))
        .otherwise((F.col("id") % 100) ** 3 / 7.0)
        .alias("v")
    )
    n = df.count()
    vals = sorted(r.v for r in df.collect())
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    b = 64
    for parts in (1, 7, 32):
        summ = quantile_summary(df.repartition(parts), "v", b=b)
        # bounded partial size: ≤ 2b points per partition
        assert summ.count() <= 2 * b * parts
        est = {r.q: r.est_value for r in
               quantile_estimates(summ, qs).collect()}
        import math

        for q in qs:
            target = math.ceil(q * n)
            v = est[q]
            rank_lo = sum(1 for x in vals if x < v) + 1
            rank_hi = sum(1 for x in vals if x <= v)
            err = n // b
            assert rank_lo <= target + err and rank_hi >= target - err, (
                q, parts, v, rank_lo, rank_hi, target, err)


def test_quantile_summary_exact_when_small_partitions(spark):
    """Partitions with n_p ≤ b emit every point — the estimate equals
    the exact discrete quantile."""
    import math

    from neo4j_database_spark.operators.sketch import (
        quantile_estimates,
        quantile_summary,
    )

    df = spark.range(0, 500).select((F.col("id") * 1.5).alias("v"))
    qs = [0.1, 0.5, 0.95]
    est = {
        r.q: r.est_value
        for r in quantile_estimates(
            quantile_summary(df.repartition(4), "v", b=1024), qs
        ).collect()
    }
    vals = sorted(r.v for r in df.collect())
    for q in qs:
        assert est[q] == vals[math.ceil(q * 500) - 1]


def test_grouped_quantile_summary_per_group_bound(spark):
    """Per-group rank bound under multiple partitionings, including a
    group small enough to be exact and a group with heavy ties."""
    import math

    from neo4j_database_spark.operators.sketch import (
        grouped_quantile_estimates,
        grouped_quantile_summary,
    )

    df = spark.range(0, 12000).select(
        F.when(F.col("id") % 3 == 0, F.lit("a"))
        .when(F.col("id") % 3 == 1, F.lit("b"))
        .when(F.col("id") < 60, F.lit("tiny"))
        .otherwise(F.lit("c"))
        .alias("g"),
        F.when(F.col("id") % 7 == 0, F.lit(1.0))
        .otherwise((F.col("id") % 250).cast("double"))
        .alias("v"),
    )
    rows = [(r.g, r.v) for r in df.collect()]
    by_g: dict[str, list[float]] = {}
    for g_, v in rows:
        by_g.setdefault(g_, []).append(v)
    for vs in by_g.values():
        vs.sort()
    qs = [0.1, 0.5, 0.9]
    b = 32
    for parts in (1, 13):
        est = grouped_quantile_estimates(
            grouped_quantile_summary(
                df.repartition(parts), ["g"], "v", b=b
            ),
            ["g"],
            qs,
        ).collect()
        assert {(r.g) for r in est} == set(by_g)
        for r in est:
            vs = by_g[r.g]
            n = len(vs)
            assert r.n == n
            target = math.ceil(r.q * n)
            rank_lo = sum(1 for x in vs if x < r.est_value) + 1
            rank_hi = sum(1 for x in vs if x <= r.est_value)
            err = n // b
            assert rank_lo <= target + err and rank_hi >= target - err, (
                r.g, r.q, parts, r.est_value, rank_lo, rank_hi, target, err)


def test_grouped_topk_equals_window_any_partitioning(spark):
    """Map-side-pruned grouped top-k == the plain window plan, under
    several partitionings, with heavy ties and groups smaller than k."""
    from pyspark.sql import Window

    from neo4j_database_spark.operators.topk import grouped_topk

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        # heavy ties: only 10 distinct order values
        (F.col("id") % 10).cast("double").alias("v"),
        F.col("id").alias("k"),
    ).union(
        # a group smaller than k
        spark.range(0, 2).select(
            F.lit("tiny").alias("g"),
            F.col("id").cast("double").alias("v"),
            (F.col("id") + 10_000).alias("k"),
        )
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("k"))
    want = sorted(
        tuple(r)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    )
    # small Arrow batches force the streaming multi-batch accumulation
    # path inside the prune (default 10k rows/batch would give one batch
    # per partition at this size)
    prev_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "257")
    try:
        for parts in (1, 3, 32):
            got = sorted(
                tuple(r)
                for r in grouped_topk(
                    df.repartition(parts), ["g"], "v", k=5, tie_cols=["k"]
                ).collect()
            )
            assert got == want, parts
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch
        )
    # ascending variant with nulls in the order column: Spark asc ranks
    # nulls FIRST — the prune must keep them
    dfn = df.withColumn(
        "v", F.when(F.col("k") % 11 == 0, F.lit(None)).otherwise(F.col("v"))
    )
    wa = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("k"))
    want_a = sorted(
        tuple(r)
        for r in dfn.withColumn("rnk", F.row_number().over(wa))
        .filter(F.col("rnk") <= 4)
        .collect()
    )
    got_a = sorted(
        tuple(r)
        for r in grouped_topk(
            dfn.repartition(13), ["g"], "v", k=4, tie_cols=["k"],
            ascending=True,
        ).collect()
    )
    assert got_a == want_a


def test_ivm_merge_equals_recompute_random_batches(spark):
    """Mergeable-state maintenance across arbitrary batch splits equals
    the one-shot aggregate, including retraction (negative) deltas for
    sum/count."""
    from pyspark.sql import functions as F

    from neo4j_database_spark.operators.ivm import (
        aggregate_batch,
        merge_state,
    )

    rows = [(i % 7, float(i * 3 % 101), i) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v double, i int")
    spec = {
        "n": ("count", F.lit(1)),
        "s": ("sum", F.col("v").cast("decimal(18,6)")),
        "mx": ("max", F.col("v")),
        "mn": ("min", F.col("v")),
    }
    full = {
        r.k: (r.n, r.s, r.mx, r.mn)
        for r in aggregate_batch(df, ["k"], spec).collect()
    }
    # three uneven batches
    b1, b2, b3 = (
        df.filter(F.col("i") % 5 < 2),
        df.filter(F.col("i") % 5 == 2),
        df.filter(F.col("i") % 5 > 2),
    )
    state = aggregate_batch(b1, ["k"], spec)
    for b in (b2, b3):
        state = merge_state(state, aggregate_batch(b, ["k"], spec), ["k"], spec)
    got = {r.k: (r.n, r.s, r.mx, r.mn) for r in state.collect()}
    assert got == full
    # retraction: re-merging a negated batch cancels sum and count
    neg = b3.select(
        "k", (-F.col("v")).alias("v"), "i"
    )
    neg_state = aggregate_batch(neg, ["k"], spec).select(
        "k", (-F.col("n")).alias("n"), "s", "mx", "mn"
    )
    reverted = merge_state(state, neg_state, ["k"], spec)
    want = {
        r.k: (r.n, r.s)
        for r in merge_state(
            aggregate_batch(b1, ["k"], spec),
            aggregate_batch(b2, ["k"], spec),
            ["k"],
            spec,
        ).collect()
    }
    got2 = {r.k: (r.n, r.s) for r in reverted.collect()}
    assert got2 == want


def test_priority_sample_matches_python_recompute(spark, sf_dir):
    """Priorities are a pure function of the row: recompute q = w/u in
    Python (same md5-prefix uniform) for every sampled row and confirm
    bit-identical doubles and correct per-group sample sizes."""
    import hashlib

    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.pipeline.curation import priority_sample

    rows = priority_sample(spark, sf_dir, k=4).collect()
    docs = load_table(spark, "documents", sf_dir)
    sizes = {
        r.lang: r.n for r in docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    per_group: dict[str, int] = {}
    for r in rows:
        per_group[r.lang] = per_group.get(r.lang, 0) + 1
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        q = float(r.n_chars) / ((h + 1) / 4294967296.0)
        assert q == r.q, (r.doc_id, q, r.q)
    assert per_group == {g: min(4, n) for g, n in sizes.items()}


def test_grouped_topk_nan_mode(spark):
    """missing='nan': Spark ranks NaN as the LARGEST double (desc →
    first, asc → LAST — the opposite side from nulls). NaN is sparse
    (~1 per group) and k=4, so the cut crosses the NaN/numeric boundary
    in desc mode and stays fully numeric in asc mode — both placements
    exercised against the plain-window plan."""
    from pyspark.sql import Window

    from neo4j_database_spark.operators.topk import grouped_topk

    df = spark.range(0, 3000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.when(F.col("id") % 997 == 0, F.lit(float("nan")))
        .otherwise((F.col("id") % 10).cast("double"))
        .alias("v"),
        F.col("id").alias("k"),
    )

    def norm(rows):
        # NaN != NaN breaks tuple equality, and mixed str/float columns
        # break tuple ordering — compare canonical strings instead
        return sorted(
            repr(
                tuple(
                    "NaN" if isinstance(x, float) and x != x else x
                    for x in r
                )
            )
            for r in rows
        )

    for ascending in (False, True):
        order = [
            F.asc("v") if ascending else F.desc("v"), F.asc("k")
        ]
        w = Window.partitionBy("g").orderBy(*order)
        want = norm(
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 4)
            .collect()
        )
        got = norm(
            grouped_topk(
                df.repartition(7), ["g"], "v", k=4, tie_cols=["k"],
                missing="nan", ascending=ascending,
            ).collect()
        )
        assert got == want, ascending
    # reserved-name guard must be loud, not silent corruption
    import pytest as _pytest

    with _pytest.raises(ValueError):
        grouped_topk(
            df.withColumnRenamed("k", "__nan__"), ["g"], "v", k=2,
            tie_cols=["__nan__"], missing="nan",
        )


def test_priority_estimator_unbiased_across_seeds():
    """Statistical validity of the DLT estimator itself, independent of
    Spark: over many seeded draws on the real sf0.001 documents table,
    the MEAN of the k-row subset-sum estimates must converge to the
    exact total (unbiasedness — the property that makes a k-row sample
    a legitimate stand-in for a full scan). Fixed seed set, generous
    bound: no flakiness."""
    import hashlib

    import duckdb

    rows = duckdb.connect().execute(
        "SELECT lang, doc_id, n_chars FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE lang = 'en'"
    ).fetchall()
    exact = sum(r[2] for r in rows)
    k = 8
    rels = []
    for seed in range(200):
        pri = []
        for _, doc_id, w in rows:
            h = int(
                hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16
            )
            u = (h + 1) / 4294967296.0
            pri.append((w / u, w))
        pri.sort(reverse=True)
        tau = pri[k][0] if len(pri) > k else 0.0
        est = sum(max(w, tau) for _, w in pri[:k])
        rels.append(est / exact)
    mean = sum(rels) / len(rels)
    # unbiased: mean of 200 draws within ~3 standard errors; single
    # draws swing ±40% (k=8), the MEAN must not
    assert abs(mean - 1.0) < 0.12, mean
