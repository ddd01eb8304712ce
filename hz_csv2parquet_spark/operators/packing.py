"""Sequence packing + skew-safe aggregation — writer-side operators
for the training-data pipeline.

``pack_assignment`` models **concat-and-chunk** packing (the GPT-style
pretraining layout: concatenate documents in a deterministic order,
cut the token stream into fixed-budget sequences; a document may
straddle a boundary — it belongs to the chunk where it *starts*).
That formulation is a running sum + integer division, so it is exact,
order-stable, and bit-identical in any engine — unlike first-fit
bin-packing, which needs a sequential scan and can't be checked by a
SQL oracle.

Scale shape: the running sum is a window per shard. Shard count grows
with the corpus (shards ≈ corpus/shard-size), so each window sorts a
bounded, writer-sized slice — the sort IS the deterministic ordering
the shard file needs anyway.

``salted_sum`` is the standard two-phase aggregation for skewed /
low-cardinality keys: partial aggregate on (key, salt) — |key|·S
parallel partitions — then final aggregate on key over ≤ S rows per
key. Results are identical to the plain groupBy (integer/decimal sums
are associative), so the oracle stays the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_assignment(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_cols: list[str],
    shard_col: str | None = None,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Assign each row a pack id (which fixed-``budget`` chunk of the
    concatenated stream it starts in) and its offset into that pack.

    ``order_cols`` must be a total order within a shard — packing is
    only meaningful for a deterministic concatenation order.
    """
    parts = [shard_col] if shard_col is not None else []
    w = Window.partitionBy(*parts).orderBy(*order_cols)
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).cast("long")
    return df.withColumn(pack_col, F.floor(start / F.lit(budget)).cast("long")).withColumn(
        offset_col, (start % F.lit(budget)).cast("long")
    )


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, Column],
    salt_col: Column,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase (salted) sum-aggregation for skewed keys:
    ``sum_cols`` maps output name → the expression to SUM (use
    ``F.lit(1)`` for a count). Phase 1 sums on (keys, salt) —
    |key|·S parallel partitions; phase 2 re-sums the ≤ S partials
    per key. Sums are associative, so the result is identical to the
    plain groupBy and the oracle stays plain GROUP BY SQL."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[F.sum(c).alias(f"__p_{name}") for name, c in sum_cols.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in sum_cols]
    )
