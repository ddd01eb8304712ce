"""Streaming deduplication — exactly-once ingest semantics for an
at-least-once source.

``dropDuplicatesWithinWatermark`` keys state by the dedup columns and
drops it once the watermark passes, so state is bounded by the
watermark horizon × key arrival rate — the only formulation that
survives an unbounded stream (a plain ``dropDuplicates`` on a stream
keys state forever and OOMs by design at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate rows (same ``keys``) arriving within the
    watermark horizon of each other; the first arrival wins."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
