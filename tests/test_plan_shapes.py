"""Physical-plan regression tests: the optimizations we rely on must
stay visible in the executed plan (SURVEY.md §4.3). A correctness-green
query whose plan regressed to full scans / shuffle joins is a perf bug
these tests catch before the benchmark does."""

from __future__ import annotations

import pytest

from neo4j_database_spark.graph import queries as gq
from neo4j_database_spark.graph.features import feature_matrix
from neo4j_database_spark.graph.store import load_graph
from neo4j_database_spark.queries import relational as rel


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def g(spark, sf_dir):
    return load_graph(spark, sf_dir)


def test_pricing_summary_scan_pruned(spark, sf_dir):
    plan = plan_of(rel.pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # projection pruning: the scan must not read unused columns
    scan = plan.split("FileScan parquet")[1].split("]")[0]
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_winder_plan_broadcasts_and_topk(g):
    plan = plan_of(gq.winder(g, ["Customer#000000000"], k=3))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
    assert "SortMergeJoin" not in plan  # nothing big shuffles for serving


def test_feature_matrix_partition_pruning(g):
    plan = plan_of(feature_matrix(g))
    # store is partitioned by type: the scan must carry partition filters
    assert "PartitionFilters" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_ego_no_shuffle_join(g):
    plan = plan_of(gq.ego_network(g, "Customer#000000042"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_customers_broadcast_dim(spark, sf_dir):
    plan = plan_of(rel.top_customers_by_spend(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_order_priority_semi_join(spark, sf_dir):
    plan = plan_of(rel.order_priority_counts(spark, sf_dir))
    assert "LeftSemi" in plan


def test_anti_join_plan(spark, sf_dir):
    plan = plan_of(rel.customers_without_orders(spark, sf_dir))
    assert "LeftAnti" in plan


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Two tables co-bucketed on the join key join with zero exchanges —
    the co-located join layout write_bucketed exists for."""
    from neo4j_database_spark.sources.io import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "bo"), "o_custkey", 8, "o_custkey"
    )
    write_bucketed(
        cust, "b_customer", str(tmp_path / "bc"), "c_custkey", 8, "c_custkey"
    )
    joined = (
        spark.table("b_orders")
        .hint("merge")  # force SMJ so the broadcast path can't hide a shuffle
        .join(
            spark.table("b_customer"),
            spark.table("b_orders").o_custkey == spark.table("b_customer").c_custkey,
        )
    )
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    # bucket-local aggregation also skips the exchange
    agg = spark.table("b_orders").groupBy("o_custkey").count()
    assert "Exchange" not in plan_of(agg)


def test_chunk_documents_no_shuffle(spark, sf_dir):
    """Chunking claims zero shuffle (sequence→explode→slice map stage);
    the final orderBy is presentation-only, so at most ONE exchange (the
    sort's range partitioning) and no hash-partition exchange at all."""
    from neo4j_database_spark.pipeline.text import chunk_documents

    plan = plan_of(chunk_documents(spark, sf_dir))
    assert "hashpartitioning" not in plan.lower()
    assert plan.count("Exchange") <= 1  # only the output sort's range exchange


def test_asof_join_single_exchange(spark):
    """The union-sort carry-forward must cost one hash exchange of the
    merged timeline — never a nested-loop or per-row range join."""
    from neo4j_database_spark.operators.asof import asof_join

    orders = spark.createDataFrame(
        [(1, 10, 100.0)], "user long, ts long, price double"
    )
    events = spark.createDataFrame([(1, 12, "e")], "user long, ts long, eid string")
    plan = plan_of(
        asof_join(events, orders, on="user", left_ts="ts", right_ts="ts",
                  value_cols=["price"])
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # one timeline shuffle


def test_pack_sequences_shard_partitioned_window(spark, sf_dir):
    """Packing must window per shard (scales out), never a global
    single-partition window."""
    from neo4j_database_spark.pipeline.text import pack_sequences

    plan = plan_of(pack_sequences(spark, sf_dir))
    assert "hashpartitioning(shard" in plan


def test_bucketed_spine_join_no_exchange(spark, sf_dir):
    """Bucketed warehouse co-location: a fact-to-fact join AND the
    per-orderkey aggregate over it must run with ZERO Exchange when both
    tables are bucketed by the join key — the storage layout, not the
    planner, provides the partitioning. Also pins the one-file-per-bucket
    write (repartition-by-bucket-hash before bucketBy), without which a
    T-task write yields T*N files."""
    import os

    from pyspark.sql import functions as F

    from neo4j_database_spark.sources.warehouse import (
        WAREHOUSE_ROOT,
        ensure_bucketed_spine,
        spine_table_name,
    )

    buckets = 8
    names = ensure_bucketed_spine(spark, sf_dir, buckets=buckets)
    o = spark.table(names["orders"]).select("o_orderkey", "o_orderpriority")
    li = spark.table(names["lineitem"]).select("l_orderkey", "l_quantity")
    # merge hint: at test SF the planner would broadcast (also exchange-
    # free, trivially); force the join strategy a 100 TB plan would use
    agg = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = plan_of(agg)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # layout: exactly one parquet file per bucket
    for table in names:
        path = os.path.join(
            WAREHOUSE_ROOT, spine_table_name(table, sf_dir, buckets)
        )
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert len(files) == buckets, (table, len(files))


def test_fill_profile_twins_agree_and_bucketed_plan(spark, sf_dir):
    """The bucketed twin must return exactly the raw-parquet result, and
    its plan must contain exactly one exchange — the 5-row priority
    rollup — versus ≥2 for the raw twin (both fact scans shuffle)."""
    from neo4j_database_spark.queries.relational import (
        order_fill_profile,
        order_fill_profile_bucketed,
    )

    raw = order_fill_profile(spark, sf_dir)
    bkt = order_fill_profile_bucketed(spark, sf_dir, buckets=8)
    # read the plan BEFORE collect: the post-execution AQE string prints
    # Final AND Initial sections, double-counting each exchange
    assert plan_of(bkt).count("Exchange hashpartitioning") == 1
    assert [tuple(r) for r in raw.collect()] == [
        tuple(r) for r in bkt.collect()
    ]


def test_ivf_index_partition_pruning(spark, sf_dir):
    """The persisted IVF index scan must prune to the probed lists via
    PartitionFilters (cent_id is a write-time partition column) — the
    storage-layout form of 'a query touches n_probe/n_lists of the
    corpus'. Also: the twin must equal the in-memory IVF result."""
    from neo4j_database_spark.pipeline.similarity import (
        ivf_index_knn,
        ivf_knn,
    )

    bkt = ivf_index_knn(spark, sf_dir)
    plan = plan_of(bkt)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "cent_id" in pf
    assert [tuple(r) for r in bkt.collect()] == [
        tuple(r) for r in ivf_knn(spark, sf_dir).collect()
    ]


def test_fuzzy_join_plan_broadcast_reattach(spark, sf_dir):
    """The r06 deletion-neighborhood fuzzy join: the candidate stream
    must flow from the variant equi-join through levenshtein without an
    intermediate shuffle — strings re-attach via TWO broadcast joins
    (size-gated), and the only hash exchanges are the variant join's
    two inputs plus the post-verification dedup."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.operators.er import edit_distance_pairs

    cust = load_table(spark, "customer", sf_dir)
    df = edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=1, q=3)
    plan = plan_of(df)
    # >= 2: the two string re-attach joins; at tiny SFs the variant
    # self-join broadcasts too (3 total), at sf0.1 it shuffles
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("SortMergeJoin") == 0
    # the candidate stream itself must NOT appear as an exchange —
    # only the variant join inputs + the post-verification dedup
    assert plan.count("Exchange hashpartitioning") <= 4
