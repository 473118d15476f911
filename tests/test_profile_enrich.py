"""Tests for the column profiler, sliding distinct users, and the
stream-static enrichment join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from neo4j_database_spark.operators.profile import profile
from neo4j_database_spark.queries import relational as rel


def test_profile_hand_case(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (None, 5.0, "b"), (4, 7.5, None)],
        "k long, x double, s string",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 4.0
    assert rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 2
    assert rows["x"]["min_num"] == 5.0 and rows["x"]["max_num"] == 7.5
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_num"] is None and rows["s"]["max_num"] is None


def test_profile_approx_mode_runs(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("m")
    )
    rows = {r["column"]: r for r in profile(df, approx_distinct=True).collect()}
    # HLL estimate: right order of magnitude, exact not required
    assert 900 <= rows["k"]["n_distinct"] <= 1100
    assert 8 <= rows["m"]["n_distinct"] <= 12


def test_sliding_distinct_users_hand_case(spark, monkeypatch):
    # day 1: users {1,2}; day 3: {2}; day 9: {3} — trailing-7d windows:
    # d1={1,2}, d3={1,2}, d9={2,3} (day 3 in range, day 1 aged out)
    rows = [
        (1, datetime(2024, 1, 1)),
        (2, datetime(2024, 1, 1)),
        (2, datetime(2024, 1, 1, 5)),  # same day dup — must not double
        (2, datetime(2024, 1, 3)),
        (3, datetime(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda spark, name, sf_dir: df,
    )
    out = {
        str(r["report_day"]): r["users_7d"]
        for r in rel.events_sliding_distinct_users(spark, "unused").collect()
    }
    assert out == {"2024-01-01": 2, "2024-01-03": 2, "2024-01-09": 2}


def test_stream_enrich_equals_batch_join(spark, sf_dir):
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.streaming.events import enrich_replay

    streamed = sorted(
        tuple(r) for r in enrich_replay(spark, sf_dir).collect()
    )
    ev = load_table(spark, "events", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    batch = sorted(
        tuple(r)
        for r in ev.filter(F.col("event_type") == "purchase")
        .join(cust, ev.user_id == cust.c_custkey)
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            "value",
        )
        .collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_merge_into_all_branches(spark):
    from neo4j_database_spark.operators.merge import merge_into

    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    # 1 → update, 2 → delete (flag), 9 → insert, 3 untouched
    src = spark.createDataFrame(
        [(1, 5.0, False), (2, 0.0, True), (9, 99.0, False)],
        "k long, delta double, purge boolean",
    )
    from pyspark.sql import functions as F

    out = {
        r["k"]: tuple(r)
        for r in merge_into(
            tgt,
            src,
            on="k",
            update_set={"bal": F.col("tgt.bal") + F.col("src.delta")},
            insert_values={"bal": F.col("src.delta")},
            delete_condition=F.col("src.purge"),
            action_col="action",
        ).collect()
    }
    assert out[1] == (1, "a", 15.0, "updated")
    assert 2 not in out
    assert out[3] == (3, "c", 30.0, "kept")
    assert out[9] == (9, None, 99.0, "inserted")


def test_edit_distance_pairs_handles_indels(spark):
    from neo4j_database_spark.operators.er import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "abcdef"),
            (2, "abdef"),  # deletion of 'c'
            (3, "abcdefg"),  # insertion of 'g'
            (4, "zzzzzz"),
        ],
        "id long, s string",
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs(df, "id", "s", max_dist=1).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1}


def test_edit_distance_pairs_complete_vs_bruteforce(spark):
    from neo4j_database_spark.operators.er import edit_distance_pairs
    from pyspark.sql import functions as F

    # deterministic varied strings: digits of i*i in different paddings
    rows = [(i, f"{(i * i) % 10007:05d}x{i % 7}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, s string")
    fast = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "s", max_dist=1).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert fast == brute and len(brute) > 0


def test_edit_distance_pairs_short_string_contract(spark):
    """Both strategies' completeness contracts, pinned.

    max_dist=1 (deletion-neighborhood since r06): EXACT for all string
    lengths — no boundary; empty strings pair via identity variants
    (and the CASE guard keeps Spark's descending sequence(1, 0) from
    emitting junk variants for them).

    max_dist>=2 (Ed-Join): pairs guaranteed found only when both
    strings have >= q*(d+1) chars (n-q+1 grams must exceed the q*d
    destroyable by d edits). Shorter strings are missed CONSISTENTLY.
    Also pins the gram-path sequence(1, 0) fix: without the length
    guard every empty/short string emitted junk grams and all empty
    strings collided in one shared quadratic bucket."""
    from neo4j_database_spark.operators.er import edit_distance_pairs

    rows = [
        (0, ""), (1, ""),          # ed 0 — found by identity variants
        (2, "xy"), (3, "xy"),      # ed 0 below q — found
        (4, "abc"), (5, "abd"),    # ed 1 on short strings — found
        (6, "abcdef"), (7, "abcdeg"),  # ed 1 — found
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "s", max_dist=1, q=3).collect()
    }
    assert got == {(0, 1), (2, 3), (4, 5), (6, 7)}

    # Ed-Join path (d=2, q=2 -> boundary q*(d+1) = 6 chars): the short
    # ed-2 pair is missed by design, the boundary-length pair is found
    rows2 = [
        (0, "abc"), (1, "axy"),            # ed 2 below the boundary: miss
        (2, "abcdef"), (3, "abxyef"),      # ed 2 at the boundary: found
    ]
    df2 = spark.createDataFrame(rows2, "id long, s string")
    got2 = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df2, "id", "s", max_dist=2, q=2).collect()
    }
    assert got2 == {(2, 3)}


def test_edit_distance_pairs_bag_filter_exact(spark):
    """The templated-corpus bag filter (r08) loses NO pairs.

    The d=2 Ed-Join path with bag_filter on (default) must return the
    exact brute-force pair set — including substitution, indel, and
    mixed edits, saturated histograms (len > 15 repeats of a class),
    and non-ASCII chars (outside every histogram class). Contract
    pinned both ways: bag on == bag off == brute force.
    """
    from neo4j_database_spark.operators.er import edit_distance_pairs
    from pyspark.sql import functions as F

    rows = [
        # templated block: shared 12-char template + 3-char salt whose
        # char bags differ -> cross-salt candidates pruned by the bag
        # filter, same-salt near-pairs kept
        (i, f"template{i % 5:04d}" + ["aaa", "bbb", "ccc"][i % 3])
        for i in range(60)
    ] + [
        (100, "abcdefghijkl"), (101, "abXdefghiYkl"),   # 2 subs
        (102, "abcdefghijklmm"), (103, "abcdefghijkl__"),  # 2 subs tail
        (104, "acdefghijkl"), (105, "abcdefghijklm"),   # del+ins vs 100
        (106, "aaaaaaaaaaaaaaaaaaaa"), (107, "aaaaaaaaaaaaaaaaaaba"),
        # saturated 'a' class (20 > 15) with one substitution
        (108, "naïve-résumé-x"), (109, "naïve-résumé-y"),  # non-ASCII
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    on = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
    }
    off = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(
            df, "id", "s", max_dist=2, bag_filter=False
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").alias("d"),
        )
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert on == off == brute
    assert {(100, 101), (106, 107), (108, 109)} <= brute


def test_bag_signature_prunes_template_mates(spark):
    """The bag filter's pruning actually fires: suffix-salted template
    mates (distinct char bags, ed >= 3) produce ZERO candidates under
    the filter, while the unfiltered candidate set is quadratic in the
    group. This is the 16x replica cell's mechanism in miniature."""
    from neo4j_database_spark.operators.er import (
        _bag_signature,
        _candidates_on,
    )
    from pyspark.sql import functions as F

    # 10 copies of one template, salts with pairwise-disjoint char bags
    salts = ["aaa", "bbb", "ccc", "ddd", "eee",
             "fff", "ggg", "hhh", "iii", "jjj"]
    df = spark.createDataFrame(
        [(i, "sharedtemplate" + s) for i, s in enumerate(salts)],
        "id long, s string",
    )
    keyed = df.select(
        "id",
        F.length("s").alias("len"),
        _bag_signature(F.col("s")).alias("sig"),
        F.lit("sharedgram").alias("k"),  # every row in one bucket
    )
    pruned = _candidates_on(keyed, max_dist=2, bag=True).count()
    raw = _candidates_on(
        keyed.drop("sig"), max_dist=2, bag=False
    ).count()
    assert raw == 45  # 10 choose 2 — the quadratic template blowup
    # the 5-way letter-class merge (a..z % 5) collides exactly the
    # salt pairs 5 apart — (a,f), (b,g), (c,h), (d,i), (e,j) — the
    # documented residual exposure; every bag-distinct pair dies in
    # the join stage
    assert pruned == 5


def test_edit_distance_pairs_auto_q(spark):
    """q="auto" (r08 templated-corpus mitigation) is output-neutral:
    the escalation only proceeds while EVERY string keeps the
    q·(max_dist)+1-gram completeness guarantee, so any chosen q yields
    the identical exact pair set. Pinned: a low-gram-diversity corpus
    (one shared template, high avg df) escalates q above 3 yet returns
    exactly the q=3 / brute-force pairs; a corpus with one short
    string refuses to escalate (the guard, not the ceiling, binds).
    """
    from neo4j_database_spark.operators.er import (
        _auto_q,
        edit_distance_pairs,
    )
    from pyspark.sql import functions as F

    # 600 30-char binary strings sharing a 20-char leading-zero
    # template: 3-grams saturate (8 distinct, avg df >> 64 -> the
    # probe triggers) while longer grams diversify, so the sampled
    # candidate estimates fall monotonically with q (measured:
    # 100k at q=3 -> 20k at q=8) and the probe escalates
    rows = [(i, f"{i:020b}{i * i % 1024:010b}") for i in range(600)]
    df = spark.createDataFrame(rows, "id long, s string")
    base = df.select(F.col("id"), F.col("s"))
    q = _auto_q(
        base.select("id", F.col("s").alias("s")), 2
    )
    assert q > 3  # low diversity detected, larger q measured cheaper
    assert q * 3 <= 30  # and the guarantee still holds for every row

    auto = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(
            df, "id", "s", max_dist=2, q="auto"
        ).collect()
    }
    fixed = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").alias("d"),
        )
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert auto == fixed == brute and len(brute) > 0

    # one short row pins min_len: (q+1)*(d+1) = 12 > 9 -> stays at 3
    short = df.unionByName(
        spark.createDataFrame([(999, "ninechars")], "id long, s string")
    ).select(F.col("id"), F.col("s").alias("s"))
    assert _auto_q(short, 2) == 3


def test_duplicated_spans_hand_case(spark, monkeypatch):
    from neo4j_database_spark.pipeline import dedup

    shared = "one two three four five six seven eight"
    rows = [
        (1, shared + " tail1 tail2"),          # spans 1-3; span 1 shared
        (2, "pre1 pre2 " + shared),            # spans 1-3; span 3 shared
        (3, "a b c d e f g h i"),              # 2 spans, none shared
        (4, "too short"),                      # < 8 tokens → no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.dedup.load_table",
        lambda s, n, d: df,
    )
    out = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ratio)
        for r in dedup.duplicated_spans(spark, "unused").collect()
    }
    assert out[1] == (3, 1, 1 / 3)
    assert out[2] == (3, 1, 1 / 3)
    assert out[3] == (2, 0, 0.0)
    assert 4 not in out


def test_check_rules_null_counts_as_violation(spark):
    from neo4j_database_spark.operators.quality import check_rules

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "k long, x double"
    )
    out = {r.rule: r for r in check_rules(
        df, {"x_positive": F.col("x") > 0, "k_small": F.col("k") < 10}
    ).collect()}
    # -1.0 fails, NULL is unknown → violation; 5.0 passes
    assert out["x_positive"].n_violations == 2
    assert out["x_positive"].ok is False
    assert out["x_positive"].pass_rate == 1 / 3
    assert out["k_small"].n_violations == 0 and out["k_small"].ok is True


def test_misra_gries_heavy_hitters_bounds(spark, sf_dir):
    """Sketch guarantees: every true heavy hitter present; estimates are
    lower bounds within n/(capacity+1) of exact counts."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.operators.sketch import misra_gries_topk
    from neo4j_database_spark.pipeline.text import _tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(_tokens(F.col("text"))).alias("tok")
    )
    exact = {
        r.tok: r.n
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    cap = 64
    out = misra_gries_topk(toks, "tok", k=15, capacity=cap).collect()
    assert len(out) == 15
    bound = n // (cap + 1)
    for r in out:
        assert r.max_underestimate == bound
        true = exact[r.item]
        assert r.est_count <= true <= r.est_count + bound, (r.item, true, r.est_count)
    # completeness: every item with true count > bound must be in the
    # sketch's top-k IF k is large enough to hold them all
    heavy = {t for t, c in exact.items() if c > bound}
    got = {r.item for r in out}
    if len(heavy) <= 15:
        assert heavy <= got


def test_misra_gries_merged_is_deterministic_and_bounded(spark, sf_dir):
    """Merge-form MG (VERDICT r06 item 5): same MG contract as the
    single-pass sketch, but a pure function of the multiset — the
    output must be byte-identical under different partitionings, obey
    est ≤ true ≤ est + n/(capacity+1) with the EXACT offset
    true − est == cut for every survivor, and keep ≤ capacity items."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.operators.sketch import misra_gries_merged
    from neo4j_database_spark.pipeline.text import _tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    exact = {
        r.tok: r.n
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    cap = 64
    full = misra_gries_merged(toks, "tok", k=None, capacity=cap).collect()
    assert len(full) <= cap
    for r in full:
        assert r.n_total == n
        true = exact[r.item]
        # the merge offset is exact, and bounded by n/(cap+1)
        assert true - r.est_count == r.max_underestimate
        assert r.max_underestimate <= n // (cap + 1)
    # every guaranteed heavy hitter (count > n/(cap+1) ≥ cut) survives
    heavy = {t for t, c in exact.items() if c > n // (cap + 1)}
    assert heavy <= {r.item for r in full}
    # determinism under repartitioning: same rows regardless of layout
    a = sorted(
        map(tuple, misra_gries_merged(toks, "tok", k=15, capacity=cap).collect())
    )
    b = sorted(
        map(
            tuple,
            misra_gries_merged(
                toks.repartition(7, "tok"), "tok", k=15, capacity=cap
            ).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            misra_gries_merged(
                toks.coalesce(1), "tok", k=15, capacity=cap
            ).collect(),
        )
    )
    assert a == b == c
