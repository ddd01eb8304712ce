"""As-of join — match each fact row to the latest dimension row at or
before its timestamp.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable
formulation used here is the **union–sort–carry-forward** pattern:

1. tag both inputs and union them into one stream of
   (key, time, side, payload);
2. partition by key, order by (time, side) — dimension rows sort
   before fact rows at equal timestamps so "at or before" includes
   exact matches;
3. ``last_value(payload, ignoreNulls) OVER (... ROWS UNBOUNDED
   PRECEDING)`` carries the most recent dimension payload forward;
4. keep the fact rows.

One shuffle on the join key, per-key sorted windows — the same cost
shape as a sort-merge join, with no range explosion and no
per-fact-row probe. This is the standard big-data as-of construction
(time-series joins in trading systems use exactly this plan).

A naive alternative — range join + per-fact top-1 — is quadratic in
matches per key; don't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    fact_time: str,
    dim_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every fact row, plus ``payload_cols`` from the
    latest dim row with ``dim_time <= fact_time`` for the same key
    (nulls when no prior dim row exists)."""
    f = facts.withColumn("__side", F.lit(1)).withColumn("__t", F.col(fact_time))
    d = dims.withColumn("__side", F.lit(0)).withColumn("__t", F.col(dim_time))

    # align schemas for the union: fact rows carry a null payload
    # struct, dim rows carry null fact columns. The payload travels as
    # ONE struct — carrying each column independently with
    # last(ignorenulls) could stitch values from different dim rows
    # when a dim payload column is legitimately NULL (and would
    # resurrect an older value over a newer NULL); a row-atomic struct
    # matches the semantics of a real ASOF JOIN.
    fact_cols = facts.columns
    d = d.withColumn("__payload", F.struct(*[F.col(c) for c in payload_cols]))
    f = f.withColumn("__payload", F.lit(None).cast(d.schema["__payload"].dataType))
    for c in fact_cols:
        if c not in d.columns:
            d = d.withColumn(c, F.lit(None).cast(facts.schema[c].dataType))
    cols = [key, "__t", "__side", *[c for c in fact_cols if c != key], "__payload"]
    u = f.select(*cols).unionByName(d.select(*cols))

    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__pl", F.last("__payload", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *fact_cols,
        *[F.col("__pl").getField(c).alias(c) for c in payload_cols],
    )
