"""Scale-safe grouped top-k.

``row_number() OVER (PARTITION BY g ORDER BY ...)`` with few distinct
``g`` values is a classic scale-killer: the whole table sorts inside
|g| tasks. The two-phase formulation here bounds every sort:

1. salt phase — top-k within (group, salt): |g|·S partitions, each a
   parallel partial sort; emits ≤ k rows per partition.
2. final phase — exact top-k over the ≤ k·S survivors per group.

Any row in the global top-k is in the top-k of its salt bucket, so
phase 2 sees every candidate — the result is identical to the
single-window form (same ranks, same rows), which is what lets the
DuckDB oracle stay a plain window query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: Column,
    n_salts: int = 32,
    rank_name: str = "rn",
) -> DataFrame:
    """Exact per-group top-k with a deterministic rank column.

    ``order_cols`` must be a total order (include a tie-break);
    ``salt_col`` any expression spreading rows across ``n_salts``
    buckets (e.g. ``pmod(key, n)``).
    """
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(n_salts)))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    pre = (
        salted.withColumn("__prn", F.row_number().over(w1))
        .filter(F.col("__prn") <= k)
        .drop("__prn", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        pre.withColumn(rank_name, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_name) <= k)
    )
