"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows (streaming/windows.py) cover time-bucketed
aggregation; this module is the escape hatch for operators Spark has
no built-in for: arbitrary per-key state evolved batch-by-batch.
``running_user_stats`` keeps (event count, max timestamp, value sum)
per user across micro-batches and emits the updated totals each
batch — the shape of a streaming feature store / per-entity monitor.

State is per key (bounded by #users, not #events) and Arrow-batched;
the value sum is accumulated in integer *cents* so cross-batch
accumulation stays exact — the same order-insensitivity discipline as
functions/exact.py, which is what lets the single-batch run be
hash-checked against a plain SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, max_tms long, value_cents long"
STATE_SCHEMA = "n long, mx long, cents long"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals over a stream: event count, latest
    event time (epoch ms), and exact value sum in cents. Emits one
    row per user per micro-batch containing that user's data."""
    import pandas as pd

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n, mx, cents = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            mx = max(mx, int(pdf["tms"].max()))
            cents += int(pdf["cents"].sum())
        state.update((n, mx, cents))
        yield pd.DataFrame([[key[0], n, mx, cents]], columns=["user_id", "n_events", "max_tms", "value_cents"])

    keyed = events.select(
        "user_id",
        F.unix_millis("ts").alias("tms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


FUNNEL_OUT_SCHEMA = (
    "user_id long, min_view_ms long, min_click_ms long, min_purchase_ms long, "
    "reached_click boolean, reached_purchase boolean"
)
FUNNEL_STATE_SCHEMA = "mv long, mc long, mp long"
_FUNNEL_STEP_MS = 3_600_000
_NONE = -1  # sentinel for "no event of this type seen yet"


def funnel_user_state(events: DataFrame, step_ms: int = _FUNNEL_STEP_MS) -> DataFrame:
    """Per-user streaming funnel state: minimum event time per funnel
    stage (view / click / purchase) evolved across micro-batches, plus
    the derived step verdicts — reached_click iff the user's first
    click falls at/after their first view and within ``step_ms``;
    reached_purchase iff additionally the first purchase follows the
    first click within ``step_ms``.

    The state is deliberately **commutative**: three per-type minima,
    each updated with ``min()`` — so the result is independent of
    batch boundaries AND of event order within/across batches (unlike
    a "first click after first view" scan, whose incremental form is
    unsound when an earlier view arrives in a later batch). The
    verdicts are pure functions OF the minima, recomputed at each
    emission. That is what makes the availableNow run hash-checkable
    against a batch SQL oracle on the same minima. State per user is
    three longs — bounded by #users, not #events."""
    import pandas as pd

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        mv, mc, mp = state.get if state.exists else (_NONE, _NONE, _NONE)

        def _min(cur: int, new_vals) -> int:
            vals = [int(v) for v in new_vals]
            if not vals:
                return cur
            lo = min(vals)
            return lo if cur == _NONE else min(cur, lo)

        for pdf in pdfs:
            mv = _min(mv, pdf.loc[pdf["event_type"] == "view", "tms"])
            mc = _min(mc, pdf.loc[pdf["event_type"] == "click", "tms"])
            mp = _min(mp, pdf.loc[pdf["event_type"] == "purchase", "tms"])
        state.update((mv, mc, mp))
        reached_click = (
            mv != _NONE and mc != _NONE and mv <= mc <= mv + step_ms
        )
        reached_purchase = bool(
            reached_click and mp != _NONE and mc <= mp <= mc + step_ms
        )
        yield pd.DataFrame(
            [[key[0], mv, mc, mp, bool(reached_click), reached_purchase]],
            columns=[
                "user_id",
                "min_view_ms",
                "min_click_ms",
                "min_purchase_ms",
                "reached_click",
                "reached_purchase",
            ],
        )

    keyed = events.select(
        "user_id", "event_type", F.unix_millis("ts").alias("tms")
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
