"""Stream-stream joins — the attribution shape.

Structured Streaming can join two unbounded streams when both carry
watermarks and the join condition bounds event-time skew: the
watermark + time-range condition tell the engine exactly how long a
row can still find a partner, so join state is evicted instead of
growing with the stream (cite: Spark structured streaming guide,
stream-stream joins). Without the range condition the state is
unbounded — that variant is refused here on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_pairs(
    clicks: DataFrame,
    views: DataFrame,
    user_col: str = "user_id",
    window: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: every click paired with the same
    user's views in the preceding ``window`` (view at or before the
    click). The equality key routes both streams through one
    exchange on ``user_col``; the time-range condition + watermarks
    bound the buffered state to ``window + watermark`` per side —
    the standard ad-attribution topology.

    Output: (click_id, view_id, user_id, gap_ms ≥ 0).
    """
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col(user_col).alias("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    v = (
        views.select(
            F.col("event_id").alias("view_id"),
            F.col(user_col).alias("__v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (c.user_id == v.__v_user)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= v.view_ts + F.expr(f"INTERVAL {window}"))
    )
    ms = lambda col: (F.unix_micros(F.col(col)) / F.lit(1000)).cast("long")  # noqa: E731
    return c.join(v, cond, "inner").select(
        "click_id",
        "view_id",
        "user_id",
        (ms("click_ts") - ms("view_ts")).alias("gap_ms"),
    )


def attribution_pairs_outer(
    clicks: DataFrame,
    views: DataFrame,
    user_col: str = "user_id",
    window: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT-OUTER stream-stream attribution: like
    :func:`attribution_pairs`, but every click row emits — clicks
    with no view in the preceding ``window`` produce a null-padded
    row (null view_id / gap_ms).

    The null emission is watermark-driven: a click can only be
    declared unmatched once the engine knows no qualifying view can
    still arrive. Views must satisfy ``view_ts <= click_ts``, so the
    click's match horizon closes when the global watermark passes
    ``click_ts`` — at which point Spark evicts the buffered click and
    emits the null row. Consequence (and the oracle's mirror
    condition): at end-of-stream the final watermark sits
    ``watermark`` behind the maximum event time, so unmatched clicks
    in that trailing band remain buffered and never emit in an
    availableNow run — exactly the late-data-safety semantics a
    resumed stream needs. State stays bounded by
    ``window + watermark`` per side, as in the inner form.

    Output: (click_id, view_id nullable, user_id, gap_ms nullable).
    """
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col(user_col).alias("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    v = (
        views.select(
            F.col("event_id").alias("view_id"),
            F.col(user_col).alias("__v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (c.user_id == v.__v_user)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= v.view_ts + F.expr(f"INTERVAL {window}"))
    )
    ms = lambda col: (F.unix_micros(F.col(col)) / F.lit(1000)).cast("long")  # noqa: E731
    return c.join(v, cond, "leftOuter").select(
        "click_id",
        "view_id",
        "user_id",
        (ms("click_ts") - ms("view_ts")).alias("gap_ms"),
    )
