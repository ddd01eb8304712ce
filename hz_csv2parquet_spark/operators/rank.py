"""Scalable exact per-partition ranking (two-phase bucket ranks).

A plain ``ROW_NUMBER()/NTILE() OVER (PARTITION BY seg ORDER BY v)``
sorts each partition inside ONE task — with low-cardinality partition
keys (market segments, languages) that is a handful of giant sorts at
100 TB. This module computes the *same numbers* without any
full-partition sort, generalizing the hash-prefix trick of
``sampling.global_shuffle_positions`` to an arbitrary value order:

1. range-bucket each row on the order value (``width_bucket`` — a
   monotone map, so bucket order refines value order);
2. per-(partition, bucket) row counts → cumulative offsets + total
   partition counts — an aggregate-sized frame (|partitions| ×
   |buckets| rows), broadcast back;
3. rank = bucket offset + rank within the (partition, bucket) cell,
   where the within-cell sorts run in parallel across cells.

The result is bit-equal to the single-window ROW_NUMBER (which is
exactly what the DuckDB oracles run), and every sort in the plan is
partitioned by (partition, bucket) — bounded by the bucket width, not
the partition size. Bucket-boundary skew (one value dominating) is the
same trade as any range partitioning; raise ``buckets`` or pick a
finer value map to split hot cells.

Reference scope note: the reference (SURVEY.md §2.5) has no window
surface at all; this is extension scale machinery for the NTILE /
exact-quantile queries (E56/E19 — the round-3 verdict's two
full-partition-sort weak spots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_rank(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    tie_cols: list[str],
    lo: float,
    hi: float,
    buckets: int = 256,
    rn_col: str = "rn",
    n_col: str = "n_part",
    offsets: DataFrame | None = None,
) -> DataFrame:
    """Add ``rn_col`` (1-based rank of ``value_col`` within
    ``part_cols``, ties broken by ``tie_cols``) and ``n_col`` (the
    partition's total row count) — bit-equal to
    ``ROW_NUMBER() OVER (PARTITION BY part ORDER BY value, ties)``
    but with no full-partition sort (see module docstring).

    ``lo``/``hi`` bound the bucketing range; out-of-range values land
    in the under/overflow buckets (0 and buckets+1), which sort
    first/last — correctness does not depend on the bounds, only cell
    balance does.

    ``offsets`` lets a caller supply the phase-2 frame (columns
    ``[*part_cols, "__bkt", "__off", n_col]``) computed elsewhere —
    e.g. several ranks' histograms fused into ONE aggregate pass over
    a shared base, so chained ranks don't each re-derive their
    histogram through the previous ranks' window lineage. It must
    hold exactly the per-(partition, bucket) cumulative counts this
    function would compute; when None the histogram computes here,
    unchanged.
    """
    base = df.withColumn(
        "__bkt", F.width_bucket(F.col(value_col), F.lit(lo), F.lit(hi), F.lit(buckets))
    )
    if offsets is None:
        counts = base.groupBy(*part_cols, "__bkt").agg(
            F.count(F.lit(1)).alias("__n")
        )
        wcum = (
            Window.partitionBy(*part_cols)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wtot = Window.partitionBy(*part_cols)
        offsets = counts.select(
            *part_cols,
            "__bkt",
            F.coalesce(F.sum("__n").over(wcum), F.lit(0)).alias("__off"),
            F.sum("__n").over(wtot).alias(n_col),
        )
    within = Window.partitionBy(*part_cols, "__bkt").orderBy(value_col, *tie_cols)
    return (
        base.join(F.broadcast(offsets), [*part_cols, "__bkt"])
        .withColumn(rn_col, (F.row_number().over(within) + F.col("__off")).cast("long"))
        .drop("__bkt", "__off")
    )


def ntile_from_rank(rn: Column, n_part: Column, n: int) -> Column:
    """SQL NTILE(n) from a 1-based rank and the partition size, in
    exact integer arithmetic: the first ``n_part % n`` tiles get
    ``⌈n_part/n⌉`` rows, the rest ``⌊n_part/n⌋`` — the standard
    remainder-to-leading-tiles rule both Spark and DuckDB implement."""
    r = n_part % n  # number of leading (one-row-larger) tiles
    q = ((n_part - r) / n).cast("long")  # rows per trailing tile (exact:
    # (n_part − r) is divisible by n and ≪ 2^53, so the double division
    # is an exact integer)
    big = q + F.lit(1)  # rows per leading tile
    head = F.floor((rn + big - F.lit(1)) / big)  # ceil(rn / big)
    tail = r + F.floor((rn - r * big + q - F.lit(1)) / q)  # r + ceil((rn − r·big)/q)
    # q = 0 (n_part < n) always takes the head branch: rn ≤ n_part = r·big
    return F.when(rn <= r * big, head).otherwise(tail).cast("long")
