"""Structured Streaming ingest.

The reference is strictly batch — its "streaming" is a 20-goroutine
worker pool over a bzip2 line reader with a ``start-after`` offset for
crash resume (overture/iterator.go:108-165). The Spark-native
equivalent is Structured Streaming: a file/rate/memory source feeding
the SAME normalize stage via foreachBatch, with checkpointLocation
subsuming start-after (exactly-once sink semantics instead of manual
line offsets).

Kept deliberately thin: streaming reuses the batch operators —
``stream_normalize`` is the identical Column pipeline applied to an
unbounded DataFrame; ``hourly_event_rollup_stream`` is the windowed-agg
(watermark + tumbling window) counterpart of the batch
``events_hourly_rollup`` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dedupe_spark.operators.normalize import normalize


def stream_normalize(stream_df: DataFrame, src: str = "code") -> DataFrame:
    """normalize() applied to a streaming DataFrame — same expressions,
    unbounded input. Valid because stage 1 is stateless per-row."""
    return normalize(stream_df, src=src)


def streaming_ingest_to_checkpoint(
    stream_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """files stream -> records parquet, exactly-once.

    foreachBatch is NOT needed for the stateless stage; a direct
    parquet sink with checkpointLocation gives the resume semantics the
    reference hand-rolled with start-after line offsets. Returns the
    StreamingQuery (caller awaits termination)."""
    records = stream_normalize(stream_df)
    writer = (
        records.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedupe(
    stream_df: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    key_cols: tuple[str, ...] = ("content_sha256",),
) -> DataFrame:
    """Stateful streaming exact-dedup: keep the FIRST record per content
    hash, dropping later duplicates as they arrive.

    The batch twin is ``dedupe.exact_duplicates``; the streaming version
    is Spark's native stateful ``dropDuplicatesWithinWatermark`` — the
    state store holds one entry per key and the watermark bounds state
    size (keys older than the watermark are evicted, so an infinite
    stream cannot grow state without bound). This is the idiomatic
    Spark answer to "dedupe an unbounded ingest feed" — no custom
    applyInPandasWithState needed for exact keys.

    Input must carry an event-time column ``ts_col``. At 100 TB/day the
    state store is RocksDB-backed (spark.sql.streaming.stateStore
    .providerClass) and keys are the 32-byte sha — bounded and
    partitioned by key hash across executors."""
    return (
        stream_df
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def streaming_canonical_assign(
    stream_df: DataFrame,
    key_col: str = "content_sha256",
    id_col: str = "id",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-content-key CANONICAL ASSIGNMENT over an unbounded ingest feed.

    The first record ever seen for a key becomes its canonical; every
    later arrival is EMITTED (not dropped) tagged with the canonical id,
    a duplicate flag, and the running occurrence count — the streaming
    form of the resolution stage's supersession edges, and something
    ``dropDuplicatesWithinWatermark`` cannot express (it can only drop).
    State per key: (canonical_id, n_seen) — tiny and fixed-width; at
    corpus scale back the state store with RocksDB
    (spark.sql.streaming.stateStore.providerClass) and add a TTL via
    GroupStateTimeout if keys are evictable.

    Output: (key, id, canonical_id, is_duplicate, n_seen)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_cols = ["key", "id", "canonical_id", "is_duplicate", "n_seen"]

    def assign(key, pdf_iter, state: GroupState):
        (k,) = key
        canonical, n = state.get if state.exists else (None, 0)
        rows = []
        for pdf in pdf_iter:
            # deterministic within a batch: ascending id order
            for rid in sorted(pdf[id_col].astype(str)):
                if canonical is None:
                    canonical = rid
                n += 1
                rows.append((k, rid, canonical, rid != canonical, n))
        state.update((canonical, n))
        yield pd.DataFrame(rows, columns=out_cols)

    sel = stream_df.select(F.col(key_col).cast("string").alias("key"),
                           F.col(id_col).cast("string").alias(id_col))
    return sel.groupBy("key").applyInPandasWithState(
        assign,
        outputStructType=("key string, id string, canonical_id string, "
                          "is_duplicate boolean, n_seen long"),
        stateStructType="canonical_id string, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hourly_event_rollup_stream(
    events_stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming counterpart of the batch events_hourly_rollup query:
    tumbling 1-hour event-time windows with a watermark for late data.

    Returns the aggregated streaming DataFrame; attach writeStream with
    outputMode('append') (closed windows only) or 'update'."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type", "n_events", "total_value",
        )
    )
