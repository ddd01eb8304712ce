"""Structured Streaming windows over the ``events`` table.

The reference is strictly batch (SURVEY.md §2.8); this is extension
surface built the idiomatic Spark way: ``readStream`` → event-time
windowed aggregation with a watermark → ``writeStream``. For the
correctness gate the streams run with ``trigger(availableNow=True)``
into a memory sink in ``complete`` mode — the stream genuinely
executes (file source, micro-batches, state store), then the final
result is a plain batch DataFrame the DuckDB oracle can hash-check.
That makes streaming a *hard* signal here, not a rows-only one.

Scale notes: event-time windows + watermark bound the state store
(late data beyond the watermark is dropped); ``session_window``
state is per (user, open session) — both are the standard shapes
that survive unbounded input. The memory sink is only the test
harness; production sinks (parquet/kafka) take the same DataFrames.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..tables import _EVENTS_NATIVE_SCHEMA, _EVENTS_RAW_SCHEMA, events_ts_is_native

#: gap used by both the streaming session windows and their batch /
#: oracle mirror (30 min, in ms)
SESSION_GAP_MS = 30 * 60 * 1000


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    options: dict | None = None,
) -> DataFrame:
    """File-source stream over events parquet files under ``sf_dir``.
    Streams need an explicit schema, so the batch reader's footer
    probe (tables.events_ts_is_native) picks between the native
    timestamp schema and the raw nanos-as-long decode — the SAME
    decision, one shared helper, for batch and streaming."""
    # the file-source requires a directory: stream the dir with a
    # glob filter selecting the events file(s). The footer probe must
    # respect the SAME glob — probing the bare dir could classify
    # events by reading an unrelated table's footer (e.g.
    # customer.parquet sorts first under an sf_dir).
    import glob as globmod

    probe = os.path.join(sf_dir, glob)
    if not os.path.isfile(probe):
        matches = sorted(globmod.glob(os.path.join(sf_dir, "**", glob or "*.parquet"), recursive=True))
        probe = matches[0] if matches else sf_dir
    reader = spark.readStream
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if events_ts_is_native(probe):
        return reader.schema(_EVENTS_NATIVE_SCHEMA).parquet(sf_dir)
    raw = reader.schema(_EVENTS_RAW_SCHEMA).parquet(sf_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Per-(hour, event_type) counts + exact value sum over tumbling
    event-time windows. The watermark bounds state; the decimal-exact
    sum keeps the result order-insensitive (oracle-hashable)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value").alias("value_sum"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (30-min inactivity gap) — the
    Structured Streaming analogue of the batch sessionize_events
    query. Emits session start, event count, and duration (last−first
    event, i.e. window length minus the trailing gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            "n_events",
            (
                F.unix_millis(F.col("session_window.end"))
                - F.lit(SESSION_GAP_MS)
                - F.unix_millis(F.col("session_window.start"))
            ).alias("duration_ms"),
        )
    )


def run_to_memory(sdf: DataFrame, mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink; return the final result as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts + exact value sum over SLIDING
    event-time windows (2 h length, 1 h slide) — each event lands in
    window/slide = 2 overlapping windows. State is bounded by the
    watermark exactly as in the tumbling case; the decimal-exact sum
    keeps the overlap arithmetic order-insensitive so the batch
    oracle (each row contributed to both of its epoch-aligned window
    starts) hash-matches."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value").alias("value_sum"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "value_sum",
        )
    )
