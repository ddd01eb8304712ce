"""Structured Streaming queries — real streams, oracle-checked.

Each query runs an actual Structured Streaming job (file source →
watermarked window agg → memory sink, availableNow trigger) and
returns the final batch result. Because the aggregates are
order-insensitive (counts + decimal-exact sums) the DuckDB oracle
can hash-check streaming output exactly — these are hard-signal
streaming checks, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import FUNNEL_STEP_MS, query
from .streaming.windows import run_to_memory, session_windows, stream_events, tumbling_counts


@query(
    "streaming_tumbling_counts",
    sql="""
    SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS window_start_ms,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    streaming=True,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 2-hour watermark,
    executed as a real stream (availableNow). Epoch-aligned windows ⇒
    the oracle is plain FLOOR arithmetic over the batch table."""
    return run_to_memory(tumbling_counts(stream_events(spark, sf_dir)))


@query(
    "streaming_session_windows",
    sql="""
    WITH o AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
    f AS (
      SELECT user_id, event_id, tms,
        CASE WHEN LAG(tms) OVER w IS NULL
                  OR tms - LAG(tms) OVER w > 1800000
             THEN 1 ELSE 0 END AS new_s
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)
    ),
    s AS (
      SELECT user_id, tms,
        SUM(new_s) OVER (
          PARTITION BY user_id ORDER BY tms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
      FROM f
    )
    SELECT user_id,
           MIN(tms) AS session_start_ms,
           COUNT(*) AS n_events,
           MAX(tms) - MIN(tms) AS duration_ms
    FROM s GROUP BY user_id, session_id
    """,
    streaming=True,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min session windows via ``session_window``, run as
    a real stream. Oracle: the batch lag/running-sum sessionization
    grouped to (start, count, duration).

    Boundary semantics (pinned empirically in
    tests/test_streaming.py): Spark merges an event into a session
    iff it arrives at or before session end (= last event + gap), so
    the oracle's new-session condition is ``diff > gap`` — identical
    to the batch sessionize_events idiom."""
    return run_to_memory(session_windows(stream_events(spark, sf_dir)))


@query(
    "streaming_stateful_user_stats",
    sql="""
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(epoch_ms(ts)) AS max_tms,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY user_id
    """,
    streaming=True,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState,
    streaming/stateful.py): per-user running totals evolved across
    micro-batches. On the single-batch fixture stream the final state
    equals the batch GROUP BY, so even arbitrary-state streaming gets
    a hash-checked oracle; multi-batch state carry-over is pinned in
    tests/test_streaming.py."""
    from .streaming.stateful import running_user_stats

    return run_to_memory(running_user_stats(stream_events(spark, sf_dir)), mode="append")


@query(
    "streaming_dedup_events",
    sql="""
    SELECT event_id, user_id, epoch_ms(ts) AS tms, event_type, value
    FROM events
    """,
    streaming=True,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup (streaming/dedup.py,
    ``dropDuplicatesWithinWatermark``) over an at-least-once stream:
    the source is the events stream UNIONed with a duplicate copy of
    every 5th event, so ~20% of arrivals are redundant; the operator
    must emit each event_id exactly once. Oracle: the original
    (already event_id-unique) events table — a hash match proves the
    planted duplicates were dropped and nothing else was."""
    from pyspark.sql import functions as F

    from .streaming.dedup import dedup_within_watermark

    ev = stream_events(spark, sf_dir)
    dup = stream_events(spark, sf_dir).filter(F.col("event_id") % 5 == 0)
    stream = ev.unionByName(dup)
    deduped = dedup_within_watermark(stream, ["event_id"])
    out = deduped.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long").alias("tms"),
        "event_type",
        "value",
    )
    return run_to_memory(out, mode="append")


@query(
    "streaming_enrich_events",
    sql="""
    SELECT e.event_id, e.user_id, e.event_type,
           n.n_name AS segment_name,
           CAST(epoch_ms(e.ts) AS BIGINT) AS tms
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    """,
    streaming=True,
)
def streaming_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched against a
    static dimension (nation, keyed by user_id mod 25) — the
    standard streaming-ingest enrichment. The static side is loaded
    once per micro-batch and broadcast; stream state is zero (no
    watermark needed for a stateless join). Deterministic join ⇒
    full hash-checked oracle, same as the batch queries."""
    from pyspark.sql import functions as F

    from .tables import table

    ev = stream_events(spark, sf_dir)
    dim = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__key"), F.col("n_name").alias("segment_name")
    )
    joined = ev.join(F.broadcast(dim), ev.user_id % 25 == F.col("__key")).select(
        "event_id",
        "user_id",
        "event_type",
        "segment_name",
        (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long").alias("tms"),
    )
    return run_to_memory(joined, mode="append")


@query(
    "streaming_attribution_join",
    sql="""
    SELECT c.event_id AS click_id,
           v.event_id AS view_id,
           c.user_id,
           CAST(epoch_ms(c.ts) - epoch_ms(v.ts) AS BIGINT) AS gap_ms
    FROM events c
    JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click'
     AND v.event_type = 'view'
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL 24 HOURS
    """,
    streaming=True,
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (streaming/joins.py): clicks paired
    with the same user's views from the preceding 24 h — both sides
    real watermarked streams, so Spark buffers bounded join state
    and evicts it past watermark + window. Deterministic pairing ⇒
    the batch self-join oracle hash-checks the streaming result
    exactly."""
    from pyspark.sql import functions as F

    from .streaming.joins import attribution_pairs

    clicks = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    views = stream_events(spark, sf_dir).filter(F.col("event_type") == "view")
    return run_to_memory(attribution_pairs(clicks, views), mode="append")


@query(
    "streaming_attribution_outer",
    sql="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
    wm AS (
      SELECT least((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM v))
             - INTERVAL 2 HOURS AS h
    ),
    matched AS (
      SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
             CAST(epoch_ms(c.ts) - epoch_ms(v.ts) AS BIGINT) AS gap_ms
      FROM c JOIN v
        ON c.user_id = v.user_id
       AND c.ts >= v.ts
       AND c.ts <= v.ts + INTERVAL 24 HOURS
    ),
    unmatched AS (
      SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS view_id, c.user_id,
             CAST(NULL AS BIGINT) AS gap_ms
      FROM c, wm
      WHERE c.ts < wm.h
        AND NOT EXISTS (
          SELECT 1 FROM v
          WHERE v.user_id = c.user_id
            AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 24 HOURS
        )
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    streaming=True,
)
def streaming_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream attribution
    (streaming/joins.py:attribution_pairs_outer): matches emit as in
    the inner join; clicks with no qualifying view emit a null-padded
    row once the global watermark passes their match horizon. The
    oracle replays Spark's watermark semantics exactly: the global
    watermark is the MIN over both streams' (max event time − 2 h
    delay), and an unmatched click emits iff ``click_ts <`` that
    final watermark — trailing-band clicks stay buffered (they could
    still match if the stream resumed), which is precisely the
    eviction rule that keeps outer-join state bounded. A hash match
    therefore pins the null-emission protocol itself, not just the
    matched pairs."""
    from pyspark.sql import functions as F

    from .streaming.joins import attribution_pairs_outer

    clicks = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    views = stream_events(spark, sf_dir).filter(F.col("event_type") == "view")
    return run_to_memory(attribution_pairs_outer(clicks, views), mode="append")


@query(
    "streaming_sliding_counts",
    sql="""
    WITH e AS (
      SELECT epoch_ms(ts) AS tms, event_type, value FROM events
    ), x AS (
      SELECT (FLOOR(tms / 3600000) - k) * 3600000 AS window_start_ms,
             event_type, value
      FROM e, UNNEST([0, 1]) AS u(k)
    )
    SELECT CAST(window_start_ms AS BIGINT) AS window_start_ms,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
             AS value_sum
    FROM x GROUP BY 1, 2
    """,
    streaming=True,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows with a 1-hour slide, run as a real
    stream (streaming/windows.py:sliding_counts). Every event belongs
    to exactly two epoch-aligned windows, so the oracle replays the
    assignment as a 2-way UNNEST fan-out over the batch table — a
    hash-checked hard signal that Spark's sliding-window expansion,
    watermarked state, and the overlap sums are all exact."""
    from .streaming.windows import sliding_counts

    return run_to_memory(sliding_counts(stream_events(spark, sf_dir)))


@query(
    "streaming_funnel_user_state",
    sql=f"""
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS mv,
             MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS mc,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS mp
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY 1
    )
    SELECT user_id,
           CAST(COALESCE(mv, -1) AS BIGINT) AS min_view_ms,
           CAST(COALESCE(mc, -1) AS BIGINT) AS min_click_ms,
           CAST(COALESCE(mp, -1) AS BIGINT) AS min_purchase_ms,
           (mv IS NOT NULL AND mc IS NOT NULL
            AND mc >= mv AND mc <= mv + {FUNNEL_STEP_MS}) AS reached_click,
           (mv IS NOT NULL AND mc IS NOT NULL
            AND mc >= mv AND mc <= mv + {FUNNEL_STEP_MS}
            AND mp IS NOT NULL AND mp >= mc AND mp <= mc + {FUNNEL_STEP_MS})
             AS reached_purchase
    FROM m
    """,
    streaming=True,
)
def streaming_funnel_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-touch funnel as a custom stateful operator
    (streaming/stateful.py:funnel_user_state): per-user minima per
    funnel stage evolved across micro-batches via
    ``applyInPandasWithState``, with the step verdicts derived from
    the minima at emission. The state is three commutative ``min``s,
    so the result is independent of batch boundaries and event order —
    which is exactly why the real availableNow run hash-matches the
    batch SQL oracle on the same minima. The batch analogue
    (E82 funnel_conversion_events) reports the aggregate funnel; this
    emits the per-user state a live product-analytics store serves."""
    from .streaming.stateful import funnel_user_state

    return run_to_memory(
        funnel_user_state(stream_events(spark, sf_dir), step_ms=FUNNEL_STEP_MS),
        mode="append",
    )


@query(
    "streaming_cdc_merge_events",
    sql="""
    SELECT user_id, event_type,
           CAST(epoch_ms(ts) AS BIGINT) AS last_ms,
           event_id AS last_event_id,
           CAST(round(value * 100) AS BIGINT) AS last_cents
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id, event_type
      ORDER BY epoch_ms(ts) DESC, event_id DESC
    ) = 1
    """,
    streaming=True,
    since=5,
)
def streaming_cdc_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-value-per-(user, type) table maintained by a real
    foreachBatch CDC merge over the event stream (streaming/cdc.py):
    a transaction-log table (sources/txlog.py) whose stats-pruned
    copy-on-write MERGE rewrites only key-intersecting files, with
    exactly-once txn markers and last-writer-wins resolution — the
    Delta-style MERGE-inside-foreachBatch lakehouse pattern, now
    O(touched ∪ batch) per micro-batch instead of O(table). The
    oracle computes the same table declaratively over the batch
    data; equality holds for ANY split of the source into
    micro-batches, which is the property the multi-batch unit test
    pins."""
    from .streaming.cdc import run_cdc_merge
    from .streaming.windows import stream_events

    return run_cdc_merge(spark, stream_events(spark, sf_dir))
