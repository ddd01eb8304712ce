"""Banded range self-join: same-key row pairs within a time gap.

The naive form — ``a JOIN b ON a.key = b.key AND b.t - a.t BETWEEN 0
AND gap`` — equi-joins on the key alone and post-filters the time
band, so a hot key (one user with 10⁶ events in 100 TB of logs)
explodes into 10¹² candidate rows before the band filter runs.

The scale-safe shape mirrors LSH banding: quantize time into
``gap``-width buckets and equi-join on **(key, bucket)** plus
**(key, bucket+1)**. Any pair within ``gap`` spans at most one bucket
boundary, so the two branches are exhaustive, and they are disjoint
(same-bucket vs adjacent-bucket), so no dedup pass is needed.
Candidate count per key drops from O(n²) to O(Σ per-bucket n²) — with
buckets sized to the band, occupancy is bounded by the key's event
*rate*, not its total history.

This is the batch analogue of a stream-stream interval join
(streaming/joins.py); Flink's interval join and DuckDB/Spark range
joins do the same bucketization inside the engine — Spark's own
range-join hints exist only on Databricks, so the bucketing is
explicit here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_interval_self_join(
    df: DataFrame,
    key_col: str,
    time_ms_col: str,
    id_col: str,
    max_gap_ms: int,
) -> DataFrame:
    """All ordered pairs (a, b) with equal ``key_col``, ``0 <=
    t_b - t_a <= max_gap_ms``, ordered so ``a`` strictly precedes
    ``b`` (time, then ``id_col`` as the deterministic tie-break; a
    row never pairs with itself).

    Output columns: every input column suffixed ``_a`` / ``_b`` plus
    ``gap_ms``. Each qualifying pair appears exactly once.
    """
    bucket = F.floor(F.col(time_ms_col) / F.lit(max_gap_ms))
    base = df.withColumn("__bkt", bucket)

    def side(suffix: str) -> DataFrame:
        renamed = base.select(
            F.col("__bkt").alias(f"__bkt{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in df.columns],
        )
        return renamed

    a, b = side("_a"), side("_b")
    key_eq = F.col(f"{key_col}_a") == F.col(f"{key_col}_b")
    same = a.join(b, key_eq & (F.col("__bkt_a") == F.col("__bkt_b")))
    adj = a.join(b, key_eq & (F.col("__bkt_a") + 1 == F.col("__bkt_b")))

    ta, tb = F.col(f"{time_ms_col}_a"), F.col(f"{time_ms_col}_b")
    ordered = (ta < tb) | (
        (ta == tb) & (F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    )
    in_band = (tb - ta) <= F.lit(max_gap_ms)
    out_cols = [f"{c}{s}" for s in ("_a", "_b") for c in df.columns]
    return (
        same.unionByName(adj)
        .filter(ordered & in_band)
        .select(*out_cols, (tb - ta).alias("gap_ms"))
    )
