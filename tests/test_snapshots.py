"""Snapshot/time-travel layer + version-diff CDC + streaming upsert sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.sources import snapshots as snap


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, bal double")


def test_snapshot_write_read_travel_rollback(spark, tmp_path):
    t = str(tmp_path / "dim")
    v1 = snap.write_snapshot(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    v2 = snap.write_snapshot(_df(spark, [(1, "a", 9.0), (3, "c", 3.0)]), t)
    assert (v1, v2) == (1, 2)
    assert snap.history(t) == [1, 2]
    assert snap.latest_version(t) == 2

    latest = {r.k: r.bal for r in snap.read_snapshot(spark, t).collect()}
    assert latest == {1: 9.0, 3: 3.0}
    travel = {r.k: r.bal for r in snap.read_snapshot(spark, t, version=1).collect()}
    assert travel == {1: 1.0, 2: 2.0}

    snap.rollback(t, 1)
    assert snap.latest_version(t) == 1
    assert {r.k for r in snap.read_snapshot(spark, t).collect()} == {1, 2}
    # newer version still retained and readable
    assert {r.k for r in snap.read_snapshot(spark, t, version=2).collect()} == {1, 3}
    with pytest.raises(ValueError):
        snap.rollback(t, 99)


def test_snapshot_diff_classifies_changes(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)])
    new = _df(spark, [(1, "a", 1.0), (2, "b", 5.0), (4, "d", 4.0), (3, "c", 3.0)])
    diff = {r.k: r.change_type
            for r in snap.snapshot_diff(old, new, ["k"]).collect()}
    # k=1 unchanged → absent; k=2 value edit; k=3 NULL→value edit;
    # k=4 insert; nothing deleted
    assert diff == {2: "update", 3: "update", 4: "insert"}
    rdiff = {r.k: r.change_type
             for r in snap.snapshot_diff(new, old, ["k"]).collect()}
    assert rdiff == {2: "update", 3: "update", 4: "delete"}


def test_streaming_upsert_sink_builds_versions(spark, sf_dir, tmp_path):
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.streaming import events as sev

    t = str(tmp_path / "user_last")
    ckpt = str(tmp_path / "ckpt")
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sev.run_foreach_batch_upsert(stream, t, ckpt, on="user_id")
    assert snap.history(t)  # at least one committed version

    # final snapshot = per-user last event (last-writer-wins on ts,
    # event_id) over the whole input
    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in snap.read_snapshot(spark, t).collect()
    }
    from pyspark.sql.window import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.user_id: (r.event_id, r.event_type)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want

    # restart with the same checkpoint: no new input → no new version
    n_before = len(snap.history(t))
    stream2 = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sev.run_foreach_batch_upsert(stream2, t, ckpt, on="user_id")
    assert len(snap.history(t)) == n_before


# ---------------- file-stats manifest + data-skipping read ----------------


def test_pruned_read_skips_files_and_keeps_rows(spark, tmp_path):
    from neo4j_database_spark.sources.io import collect_file_stats, pruned_read

    path = str(tmp_path / "facts")
    # 8 files, each a distinct contiguous id range -> perfectly prunable
    df = spark.range(0, 8000).select(
        F.col("id"), (F.col("id") % 7).alias("payload")
    )
    df.repartitionByRange(8, "id").write.parquet(path)

    stats = collect_file_stats(spark, path, ["id"])
    assert stats.count() == 8

    got, read, total = pruned_read(spark, path, stats, "id", 2500, 3499)
    assert total == 8 and read <= 2            # 1-2 boundary-straddling files
    want = {r.id for r in spark.read.parquet(path)
            .filter((F.col("id") >= 2500) & (F.col("id") <= 3499)).collect()}
    assert {r.id for r in got.collect()} == want

    # empty intersection -> zero files, empty frame, schema intact
    got0, read0, _ = pruned_read(spark, path, stats, "id", 10**9, 2 * 10**9)
    assert read0 == 0 and got0.count() == 0 and got0.columns == ["id", "payload"]


def test_streaming_ivm_sink_maintains_aggregate_view(spark, sf_dir, tmp_path):
    """The streaming materialized view equals the batch aggregate over
    the whole input, and a checkpoint restart folds nothing twice."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.streaming import events as sev

    t = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "mv_ckpt")
    spec = {
        "n": ("count", F.lit(1)),
        "total": ("sum", F.col("value").cast("decimal(18,6)")),
        "max_v": ("max", F.col("value")),
    }
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sev.run_foreach_batch_ivm(stream, t, ckpt, ["event_type"], spec)

    got = {
        r.event_type: (r.n, r.total, r.max_v)
        for r in snap.read_snapshot(spark, t).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    want = {
        r.event_type: (r.n, r.total, r.max_v)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
            F.max("value").alias("max_v"),
        )
        .collect()
    }
    assert got == want

    # restart: no new input, no double-folding, no new version
    n_before = len(snap.history(t))
    stream2 = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sev.run_foreach_batch_ivm(stream2, t, ckpt, ["event_type"], spec)
    assert len(snap.history(t)) == n_before
    got2 = {
        r.event_type: (r.n, r.total, r.max_v)
        for r in snap.read_snapshot(spark, t).collect()
    }
    assert got2 == want


def test_vacuum_retention(spark, tmp_path):
    t = str(tmp_path / "vac")
    for i in range(5):
        snap.write_snapshot(_df(spark, [(i, "x", float(i))]), t)
    assert snap.history(t) == [1, 2, 3, 4, 5]
    removed = snap.vacuum(t, keep_last=2)
    assert removed == [1, 2, 3]
    assert snap.history(t) == [4, 5]
    # retained versions stay readable
    assert {r.k for r in snap.read_snapshot(spark, t, version=4).collect()} == {3}
    # the pointer's version is never vacuumed even if old
    snap.rollback(t, 4)
    assert snap.vacuum(t, keep_last=1) == []
    assert snap.history(t) == [4, 5]
    with pytest.raises(ValueError):
        snap.vacuum(t, keep_last=0)
