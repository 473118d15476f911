"""Streaming pipelines over the events table.

The batch queries in queries/relational.py (hourly windows,
sessionization) re-expressed as Structured Streaming plans: file source
→ watermark → windowed/stateful aggregation → sink. Tests drive them
with ``trigger(availableNow=True)`` against the static events parquet —
the exact pattern for replay/backfill on a production stream.

Scale notes:
- Watermark bounds state: late events beyond WATERMARK are dropped, so
  the window-state store stays O(active windows), not O(history).
- The windowed aggregate is a streaming partial+final hash aggregate;
  output mode "append" emits each window once, on watermark passing —
  the right mode for downstream parquet sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WATERMARK = "2 hours"

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over event parquet drops (one file = one
    micro-batch unit).

    A file-source stream needs its schema up front, but the generator has
    shipped events.ts under two physical encodings (epoch-nanos long /
    TIMESTAMP(MICROS) — see catalog.normalize_event_time). Probe the
    existing files with a batch read (footer-only, no data scan) and
    build the stream schema from what is actually on disk, then normalize
    to a proper event-time column.
    """
    from neo4j_database_spark.catalog import (
        ensure_session_confs,
        normalize_event_time,
    )

    ensure_session_confs(spark)
    ts_type = spark.read.parquet(events_dir).schema["ts"].dataType
    reader = spark.readStream.schema(_events_stream_schema(ts_type)).option(
        "maxFilesPerTrigger", 1
    )
    if events_dir.endswith(".parquet"):
        # single-file input: the file source requires a directory, so
        # stream the parent with a glob pinned to that file
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    raw = reader.parquet(events_dir)
    return normalize_event_time(raw)


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type with a late-data watermark —
    the streaming twin of relational.events_hourly."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation, DOUBLE output (decimal outputs
            # hash-mismatch on the driver — see queries/relational._money_out)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_activity_stream(events: DataFrame) -> DataFrame:
    """30-min windows sliding every 10 min, per-user activity counts —
    exercises overlapping-window state."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "user_id",
            "n_events",
        )
    )


def hourly_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-facing replay of the streaming hourly rollup: run the
    watermarked stream over all available input and return the emitted
    (closed) windows as a DataFrame.

    Append-mode emission is deterministic: after the availableNow replay
    the watermark sits at max(event_time) - WATERMARK, and exactly the
    windows with ``window_end <= watermark`` have been emitted — which
    is why this streaming pipeline has an exact SQL oracle
    (__spark_entry__.py: stream_hourly_rollup).
    """
    name = "stream_hourly_rollup_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory_sink(hourly_rollup_stream(stream), name)
    return spark.table(name)


def session_windows_stream(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Streaming gap-based sessionization with ``F.session_window`` —
    MERGING window state: a late-but-in-watermark event can extend a
    session or fuse two open sessions, which tumbling windows cannot
    express. The watermark closes a session once no event can extend it
    (watermark ≥ session end = last event + gap), bounding state to the
    open sessions per user.

    The same expression as the batch twin
    (queries/relational.events_session_windows) — one groupBy swap is
    the whole batch→stream migration."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def session_windows_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow replay of streaming sessionization: append mode
    emits exactly the sessions the final watermark (max ts − WATERMARK)
    has closed (session_end = last event + gap ≤ watermark) — a
    deterministic subset of the batch sessionization, hence an exact
    SQL oracle (stream_session_windows)."""
    name = "stream_session_windows_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory_sink(session_windows_stream(stream), name)
    return spark.table(name).orderBy("user_id", "session_start")


def user_activity_state_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    lifetime counters (events seen, value sum, last event time) carried
    across micro-batches in the state store.

    The canonical template for operators Spark lacks natively (the
    north-star "custom stateful operators" slot): state is an explicit
    tuple schema, every micro-batch folds its group rows into it, and a
    processing-time timeout would expire idle users (not set here so
    replay output is deterministic).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "n_events long, sum_value double, last_ts_us long"
    output_schema = (
        "user_id long, n_events long, sum_value double, last_ts_us long"
    )

    def update(key, pdfs, state: GroupState):
        n, total, last = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max()) // 1000)
        state.update((n, total, last))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "last_ts_us": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, timeout_sec: int = 300
) -> None:
    """Drive a streaming plan to completion over all available input
    (availableNow trigger) into an in-memory table for inspection."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def click_attribution_stream(
    events: DataFrame, attribution_minutes: int = 30
) -> DataFrame:
    """Stream-stream self-join with event-time bounds: attribute each
    purchase to the same user's clicks in the preceding N minutes.

    Both sides carry watermarks and the join condition carries a time
    range, so Spark bounds the join state to [watermark, now] on each
    side — the canonical scalable stream-stream join (state is
    O(window), not O(history)). Inner-join matches are emitted as soon
    as both sides arrive; over a full availableNow replay the emitted
    set equals the batch join exactly, which is why this streaming
    pipeline has an exact SQL oracle (stream_click_attribution).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_minutes} MINUTES")
        ),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("long").alias("click_sec"),
        F.col("purchase_ts").cast("long").alias("purchase_sec"),
    )


def click_attribution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-facing availableNow replay of the stream-stream join."""
    name = "stream_click_attribution_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory_sink(click_attribution_stream(stream), name)
    return spark.table(name).orderBy("user_id", "click_id", "purchase_id")


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Streaming exact deduplication: keep one row per event_id across
    micro-batches, with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` is the operator whose state the
    watermark actually evicts: an id is remembered only until the
    watermark passes its event time, so state is O(events inside the
    watermark window), not O(all ids ever seen). Plain
    ``dropDuplicates(['event_id'])`` would grow the state store forever
    (Spark only evicts dropDuplicates state when the event-time column
    is part of the key subset) — the classic scale failure for
    at-least-once upstreams, whose duplicates arrive close together.

    Projection to the key + payload BEFORE dedup keeps the state-store
    row narrow."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow replay of the streaming dedup over a deliberately
    DOUBLED input (the same parquet read as two stream branches,
    unioned): the emitted set must equal the original events exactly —
    which makes the whole pipeline SQL-oracle-checkable (stream_dedup).
    """
    name = "stream_dedup_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    path = f"{sf_dir}/events.parquet"
    doubled = read_events_stream(spark, path).unionByName(
        read_events_stream(spark, path)
    )
    out = dedup_events_stream(doubled).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
    )
    run_to_memory_sink(out, name)
    return spark.table(name).orderBy("event_id")


def enrich_events_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment — the single most common
    production streaming shape: a fact stream joined to a slowly-changing
    dimension snapshot.

    A stream-static inner join is STATELESS (no watermark, no state
    store): each micro-batch joins against the current dim snapshot and
    emits immediately. With a broadcast hint on the static side every
    executor holds the dim once and the stream never shuffles — at 100 TB
    of stream the dim table (customers) is the small side by orders of
    magnitude, so this is the plan you want on a real cluster. The dim
    frame is re-read per micro-batch by Spark, which is exactly how
    slowly-changing dims pick up updates mid-stream.
    """
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(
            F.broadcast(dim.select("c_custkey", "c_mktsegment")),
            events.user_id == F.col("c_custkey"),
        )
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            "value",
        )
    )


def enrich_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow replay of the stream-static enrichment. Stateless →
    the emitted set is exactly the batch join's result, so the pipeline
    has an exact SQL oracle (stream_enrich)."""
    from neo4j_database_spark.catalog import load_table

    name = "stream_enrich_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = load_table(spark, "customer", sf_dir)
    run_to_memory_sink(enrich_events_stream(stream, dim), name)
    return spark.table(name)


def run_foreach_batch_parquet(
    stream_df: DataFrame,
    dst_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> None:
    """Exactly-once parquet delivery via the foreachBatch contract.

    Structured Streaming guarantees foreachBatch is called with a
    deterministic (batch_df, epoch_id) pair per micro-batch; writing
    each epoch to its own ``epoch=<id>`` directory with overwrite makes
    REPLAYED epochs (failure → restart from checkpoint) rewrite the same
    path instead of appending duplicates — at-least-once execution,
    exactly-once visible output. This is the standard idempotent-sink
    recipe for engines without a transactional table format; with
    Delta/Iceberg the body becomes a MERGE keyed on epoch
    (operators/merge.py is that MERGE, batch-side).

    The checkpoint directory carries source offsets per epoch, so a
    restarted query resumes — never re-reads — committed input.
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{dst_dir}/epoch={epoch_id}"
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def user_span_tws_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator on the Spark 4 ``transformWithState``
    API (StatefulProcessor): per-user lifetime span — event count,
    first/last event time — carried in a typed ValueState across
    micro-batches.

    This is the successor API to ``applyInPandasWithState`` (above,
    kept as the 3.x-compatible template): state is declared through a
    handle (value/list/map primitives, TTL support, initial-state
    seeding) instead of one opaque tuple, and the processor is a class
    the runtime drives per grouping key. Emits one updated row per user
    per micro-batch (update mode), exactly like a streaming upsert sink
    expects.

    Environment gate: the transformWithState runtime speaks protobuf to
    its Python state server; where ``google.protobuf`` is absent (this
    container) the query would crash at worker init, so we raise a
    clear ImportError up front. ``user_activity_state_stream`` is the
    protobuf-free equivalent.
    """
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithState requires the protobuf runtime "
            "(google.protobuf) for its state-server protocol; use "
            "user_activity_state_stream (applyInPandasWithState) here"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("first_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
        ]
    )

    class SpanProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._span = handle.getValueState("span", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, first, last = (
                self._span.get() if self._span.exists() else (0, None, None)
            )
            for pdf in rows:
                us = pdf["ts"].astype("int64") // 1000
                n += len(pdf)
                lo, hi = int(us.min()), int(us.max())
                first = lo if first is None else min(first, lo)
                last = hi if last is None else max(last, hi)
            self._span.update((n, first, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "first_us": [first],
                    "last_us": [last],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        SpanProcessor(),
        outputStructType=(
            "user_id long, n_events long, first_us long, last_us long"
        ),
        outputMode="Update",
        timeMode="None",
    )


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    on: str,
    timeout_sec: int = 300,
) -> None:
    """Streaming UPSERT sink: each micro-batch MERGEs into the current
    table snapshot and commits a new version — foreachBatch +
    operators/merge.merge_into + sources/snapshots, composed into the
    "streaming CDC apply" every warehouse needs (the foreachBatch body
    Delta users write as ``MERGE INTO``, on the engine's own snapshot
    layer).

    Exactly-once reasoning: the checkpoint replays an epoch at most
    once after a crash, and a replayed MERGE of the same batch against
    the already-merged snapshot is a NO-OP row-wise (upsert to the
    already-upserted values) — idempotent delivery without a
    transaction log, at the cost of a possible duplicate version with
    identical content. Batch keys are deduplicated last-writer-wins
    (max event time) before the merge, since a micro-batch can carry
    several rows per key.
    """
    from neo4j_database_spark.operators.merge import merge_into
    from neo4j_database_spark.sources import snapshots

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql.window import Window as W

        spark = batch_df.sparkSession
        w = W.partitionBy(on).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if snapshots.latest_version(table_dir) is None:
            snapshots.write_snapshot(batch, table_dir)
            return
        target = snapshots.read_snapshot(spark, table_dir)
        merged = merge_into(
            target,
            batch,
            on=on,
            update_set={
                c: F.col(f"src.{c}") for c in batch.columns if c != on
            },
            insert_values={c: F.col(f"src.{c}") for c in batch.columns},
        )
        snapshots.write_snapshot(merged, table_dir)

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def run_foreach_batch_ivm(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    spec: dict,
    timeout_sec: int = 300,
) -> None:
    """Streaming MATERIALIZED VIEW sink: each micro-batch aggregates to
    mergeable partials (operators/ivm.aggregate_batch — linear in the
    batch) and folds into the persisted aggregate state
    (ivm.merge_state — one state-sized merge), committed as a snapshot
    version. History is never re-read: the view stays current at
    per-batch cost, which is the whole point of incremental view
    maintenance over a stream.

    Exactly-once reasoning differs from the upsert sink: a replayed
    AGGREGATE merge would double-count, so each epoch's fold is guarded
    by recording the epoch id in the snapshot's commit marker — a
    replayed epoch that already committed is skipped (the
    read-epoch-then-merge is the idempotence ledger a transaction log
    provides in Delta/Iceberg).
    """
    from neo4j_database_spark.operators.ivm import (
        aggregate_batch,
        merge_state,
    )
    from neo4j_database_spark.sources import snapshots

    import json
    import os

    marker = os.path.join(state_dir, "_applied_epochs.json")

    def _applied() -> set:
        if not os.path.exists(marker):
            return set()
        with open(marker) as f:
            return set(json.load(f))

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        done = _applied()
        if epoch_id in done:
            return  # crash-replayed epoch: already folded in
        delta = aggregate_batch(batch_df, keys, spec)
        if snapshots.latest_version(state_dir) is None:
            snapshots.write_snapshot(delta, state_dir)
        else:
            state = snapshots.read_snapshot(spark, state_dir)
            snapshots.write_snapshot(
                merge_state(state, delta, keys, spec), state_dir
            )
        done.add(epoch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(done), f)
        os.replace(tmp, marker)

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
