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
