"""Unit tests for the set-op / correlated-subquery / session-window
relational extensions (oracle-checked end-to-end by the driver; these
pin the semantics that the oracle comparison relies on)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from neo4j_database_spark.queries import relational as rel

SF = "/root/testdata/sf0.001"


def test_session_window_gap_boundary(spark):
    # Spark's session windows span [ts, ts+gap] and MERGE on boundary
    # touch: a gap of exactly the threshold stays in the same session; a
    # new session needs a strictly greater gap. This is the strict->
    # semantics the events_session_windows oracle encodes.
    t0 = datetime(2020, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + timedelta(seconds=1800)),          # exact gap → merges
            (1, t0 + timedelta(seconds=1800 + 1801)),   # gap > 30min → new
        ],
        "user_id long, ts timestamp",
    )
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("session_window.start"))
        .collect()
    )
    assert [r.n for r in sess] == [2, 1]


def test_customer_year_sets_disjoint(spark):
    df = rel.customer_year_sets(spark, SF)
    per_key = df.groupBy("custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per_key and all(r.n == 1 for r in per_key)  # INTERSECT ∩ EXCEPT = ∅
    statuses = {r.status for r in df.select("status").distinct().collect()}
    assert statuses <= {"both_years", "lapsed_after_1995"}


def test_orders_above_customer_avg_bounds(spark):
    rows = rel.orders_above_customer_avg(spark, SF).collect()
    assert rows
    for r in rows:
        # strictly-above-average can never include every order, and a
        # single-order customer can never beat their own average.
        assert 0 <= r.n_above_avg < max(r.n_orders, 2)
        if r.n_orders == 1:
            assert r.n_above_avg == 0


def test_approx_percentiles_near_exact(spark, sf_dir):
    from neo4j_database_spark.queries import relational as rel
    from neo4j_database_spark.catalog import load_table
    from pyspark.sql import functions as F

    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in rel.events_value_percentiles_approx(spark, sf_dir).collect()
    }
    values = {}
    for r in (
        load_table(spark, "events", sf_dir)
        .select("event_type", "value")
        .collect()
    ):
        values.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(values)
    # the GK guarantee is on RANK, not value: the returned element's
    # rank must be within n/accuracy (+1 slack) of the target rank
    for et, vals in values.items():
        vals.sort()
        n = len(vals)
        for a, p in zip(approx[et], (0.5, 0.9, 0.99)):
            rank = sum(1 for v in vals if v <= a)
            assert abs(rank - p * n) <= n / 10000 + 1, (et, p, a, rank)


def test_lineitem_correlations_match_builtin(spark, sf_dir):
    from neo4j_database_spark.queries import relational as rel
    from neo4j_database_spark.catalog import load_table
    from pyspark.sql import functions as F

    ours = {
        r.l_returnflag: r.corr_qty_price
        for r in rel.lineitem_correlations(spark, sf_dir).collect()
    }
    builtin = {
        r.l_returnflag: r.c
        for r in load_table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(ours) == set(builtin)
    for k in ours:
        assert abs(ours[k] - builtin[k]) < 1e-9, (k, ours[k], builtin[k])


def test_user_state_scd2_hand_case(spark, monkeypatch):
    from datetime import datetime

    from neo4j_database_spark.queries import relational as rel

    rows = [
        (1, "view", datetime(2024, 1, 1, 0), 10),
        (1, "view", datetime(2024, 1, 1, 1), 11),
        (1, "click", datetime(2024, 1, 1, 2), 12),
        (1, "view", datetime(2024, 1, 1, 3), 13),  # state can recur
        (2, "signup", datetime(2024, 1, 2, 0), 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = [
        (r.user_id, r.version, r.state, r.is_current, r.n_events)
        for r in rel.user_state_scd2(spark, "unused").collect()
    ]
    assert out == [
        (1, 1, "view", False, 2),
        (1, 2, "click", False, 1),
        (1, 3, "view", True, 1),
        (2, 1, "signup", True, 1),
    ]
    # intervals must tile: valid_to of version k == valid_from of k+1
    recs = rel.user_state_scd2(spark, "unused").collect()
    by_user = {}
    for r in recs:
        by_user.setdefault(r.user_id, []).append(r)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            assert a.valid_to == b.valid_from
        assert seq[-1].valid_to is None


def test_events_hourly_anomalies_hand_case(spark, monkeypatch):
    """A flat series with one spike: only the spike hour is flagged."""
    from datetime import datetime, timedelta

    from neo4j_database_spark.queries import relational as rel

    rows = []
    base = datetime(2024, 1, 1)
    for h in range(40):
        n = 50 if h != 30 else 500  # spike at hour 30
        # vary counts slightly so trailing variance is nonzero
        n += h % 3
        for i in range(n):
            rows.append((1, "view", base + timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = rel.events_hourly_anomalies(spark, "unused").collect()
    spike_sec = int((base + timedelta(hours=30)).timestamp())
    flagged = {r.hour_sec: r.z for r in out}
    assert spike_sec in flagged and flagged[spike_sec] > 2
    # hour 31's trailing window absorbs the spike → huge variance; no
    # other *positive* spike may be flagged
    assert all(
        sec == spike_sec or z < 0 or z <= 2.0 for sec, z in flagged.items()
    )


def test_events_twap_daily_hand_case(spark, monkeypatch):
    """Two observations: 10.0 held for 6h, then 20.0 held to midnight
    (18h) → TWAP = (10*6 + 20*18)/24 = 17.5."""
    from datetime import datetime

    from neo4j_database_spark.queries import relational as rel

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 10.0, 100),
        (1, datetime(2024, 1, 1, 6, 0, 0), 20.0, 101),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = rel.events_twap_daily(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_obs == 2
    assert r.held_sec == 86400
    assert r.twap == (10.0 * 6 + 20.0 * 18) / 24


def test_events_ohlc_daily_hand_case(spark, monkeypatch):
    from datetime import datetime

    from neo4j_database_spark.queries import relational as rel

    rows = [
        # same-second open tie broken by event_id: 10 before 11
        (1, "tick", datetime(2024, 1, 1, 0, 0, 0), 10, 5.0),
        (2, "tick", datetime(2024, 1, 1, 0, 0, 0), 11, 9.0),
        (3, "tick", datetime(2024, 1, 1, 12, 0, 0), 12, 1.0),
        (4, "tick", datetime(2024, 1, 1, 23, 0, 0), 13, 7.0),
        (5, "tick", datetime(2024, 1, 2, 0, 0, 0), 14, 2.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, "
        "user_id long, value double",
    )
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = [
        (str(r.day), r.open, r.high, r.low, r.close, r.n_ticks)
        for r in rel.events_ohlc_daily(spark, "unused").collect()
    ]
    assert out == [
        ("2024-01-01", 5.0, 9.0, 1.0, 7.0, 4),
        ("2024-01-02", 2.0, 2.0, 2.0, 2.0, 1),
    ]


def test_orders_price_histogram_clamps(spark, monkeypatch):
    from datetime import datetime

    from neo4j_database_spark.queries import relational as rel

    rows = [
        (1, -50.0),          # below range -> bin 0
        (2, 0.0),            # bin 0
        (3, 29999.99),       # bin 0 (upper edge exclusive)
        (4, 30000.0),        # bin 1 (lower edge inclusive)
        (5, 1e7),            # above range -> bin 19
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = {r.bin: r.n for r in rel.orders_price_histogram(spark, "unused").collect()}
    assert out == {0: 3, 1: 1, 19: 1}


def test_events_daily_forecast_hand_case(spark, monkeypatch):
    from datetime import datetime

    from neo4j_database_spark.queries import relational as rel

    # 14 days of a strict weekly pattern: count = weekday index (Mon=0..6)
    rows = []
    eid = 0
    for d in range(1, 15):
        dt = datetime(2024, 1, d)
        for _ in range(dt.weekday()):
            rows.append((eid, "tick", dt, 1, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, "
        "user_id long, value double",
    )
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda s, n, d: df,
    )
    out = {r.h: (str(r.day), r.seasonal_naive, r.ma)
           for r in rel.events_daily_forecast(spark, "unused").collect()}
    # last observed day = Sun Jan 14 (weekday 6, count 6); forecasts
    # repeat the weekly pattern exactly: Jan 15 Mon→0, 16 Tue→1, 17 Wed→2
    assert out[1] == ("2024-01-15", 0, 3.0)
    assert out[2] == ("2024-01-16", 1, 3.0)
    assert out[3] == ("2024-01-17", 2, 3.0)


def test_small_qty_part_revenue_threshold_semantics(spark):
    # Every surviving row is strictly below 20% of its part's average
    # quantity; the single output row divides the exact sum by 7.
    row = rel.small_qty_part_revenue(spark, SF).collect()[0]
    assert row.n_small_qty_items >= 0
    if row.n_small_qty_items:
        assert row.avg_yearly > 0.0


def test_big_volume_customers_all_exceed_threshold(spark):
    rows = rel.big_volume_customers(spark, SF, min_qty=250).collect()
    assert rows, "sf0.001 should have at least one >250-qty order"
    assert all(r.total_qty > 250 for r in rows)
    # descending by qty, orderkey tie-break ascending
    qtys = [r.total_qty for r in rows]
    assert qtys == sorted(qtys, reverse=True)


def test_disjunctive_part_revenue_matches_union_of_bands(spark):
    # The OR-of-ANDs result equals the sum of the three disjoint bands
    # computed separately (bands are brand-disjoint by construction).
    from neo4j_database_spark.catalog import load_table

    total = rel.disjunctive_part_revenue(spark, SF).collect()[0]
    li = load_table(spark, "lineitem", SF)
    part = load_table(spark, "part", SF)
    j = li.join(part, li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity").cast("bigint")
    bands = [
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11)),
        ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20)),
        ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & qty.between(20, 30)),
    ]
    n = sum(j.filter(b).count() for b in bands)
    assert total.n_items == n


def test_idle_rich_customers_filters(spark):
    # Every group only counts customers above the positive-balance
    # average; codes are 0..9.
    rows = rel.idle_rich_customers(spark, SF).collect()
    assert all(0 <= r.code <= 9 for r in rows)
    assert all(r.n_custs >= 1 for r in rows)


def test_nation_market_share_bounds(spark):
    rows = rel.nation_market_share(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.total_revenue > 0.0


def test_cheapest_supplier_per_part_is_min(spark):
    from neo4j_database_spark.catalog import load_table

    rows = rel.cheapest_supplier_per_part(spark, SF, k=5).collect()
    assert rows
    li = load_table(spark, "lineitem", SF)
    for r in rows[:3]:
        true_min = (
            li.filter(F.col("l_partkey") == r.partkey)
            .agg(F.min(F.col("l_extendedprice").cast("decimal(18,6)")))
            .collect()[0][0]
        )
        assert float(true_min) == r.min_price


def test_brand_association_rules_invariants(spark):
    rows = rel.brand_association_rules(spark, SF, min_both=5, k=30).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b          # canonical pair order
        assert r.n_both >= 5
        assert r.n_both <= min(r.n_a, r.n_b)  # pair ⊆ each side
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_sales_marginals_levels(spark):
    rows = rel.sales_marginals(spark, SF).collect()
    # exactly two levels: 1 = by-year (status nulled), 2 = by-status
    levels = {r.level for r in rows}
    assert levels == {1, 2}
    for r in rows:
        if r.level == 1:
            assert r.o_year is not None and r.status is None
        else:
            assert r.o_year is None and r.status is not None
    # both marginals sum to the same grand total
    t1 = sum(r.n_orders for r in rows if r.level == 1)
    t2 = sum(r.n_orders for r in rows if r.level == 2)
    assert t1 == t2 > 0


def test_events_audience_overlap_invariants(spark):
    rows = rel.events_audience_overlap(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= 1.0


def test_nation_share_window_sums_to_one(spark):
    rows = rel.nation_share_window(spark, SF).collect()
    by_year = {}
    for r in rows:
        by_year.setdefault(r.o_year, []).append(r.share)
        assert 0.0 < r.share <= 1.0
    for year, shares in by_year.items():
        assert abs(sum(shares) - 1.0) < 1e-9, year


def test_customer_hierarchy_rollup_consistency(spark):
    from neo4j_database_spark.catalog import load_table

    rows = {r.node: r for r in rel.customer_hierarchy_rollup(spark, SF).collect()}
    assert rows
    cust = load_table(spark, "customer", SF).select("c_custkey", "c_acctbal").collect()
    # every internal node's count equals the number of custkeys whose
    # decimal representation has the node as a prefix-by-division
    import random

    rnd = random.Random(3)
    keys = [r.c_custkey for r in cust]
    for node in rnd.sample(sorted(rows), min(5, len(rows))):
        member = lambda k: any(
            k // (10**i) == node for i in range(8)
        )
        want = sum(1 for k in keys if member(k))
        assert rows[node].subtree_customers == want


def test_monthly_revenue_growth_identity(spark):
    import pytest

    rows = rel.monthly_revenue_growth(spark, SF).collect()
    assert rows[0].growth is None  # first month has no predecessor
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_revenue == prev.revenue
        if cur.growth is not None:
            assert cur.growth == pytest.approx(
                (cur.revenue - cur.prev_revenue) / cur.prev_revenue, rel=1e-9
            )


def test_money_prod_twins_match_decimal_twins(spark):
    # The BIGINT-scaled-integer production money path must agree with the
    # oracle-exact decimal path to the last bit: both recover the exact
    # 2-decimal grid values, accumulate exactly, and emit the same
    # correctly-rounded DOUBLE.
    #
    # Claim scope: exact equality holds while each scaled integer group
    # sum stays under 2^53 (~1.8e5 rows/group for the 1e-6-dollar charge
    # term; sf0.001/sf0.01 are far inside). Beyond that, long->double
    # before the divide double-rounds and the twins can differ by 1 ulp
    # even though each side's DuckDB oracle comparison stays exact — at
    # larger SFs compare with 1-ulp tolerance instead (see
    # pricing_summary_prod docstring).
    for prod, oracle in [
        (rel.pricing_summary_prod, rel.pricing_summary),
        (rel.nation_revenue_prod, rel.nation_revenue),
        (rel.top_customers_by_spend_prod, rel.top_customers_by_spend),
    ]:
        a = sorted(map(tuple, prod(spark, SF).collect()))
        b = sorted(map(tuple, oracle(spark, SF).collect()))
        assert a == b, prod.__name__
