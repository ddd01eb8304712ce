"""Deterministic sampling & shard assignment — the reproducibility
primitives of a training-data pipeline.

``rand()``-based sampling is useless at 100 TB: it changes under
retry, under AQE re-planning, and across engines, so a pipeline can't
be re-run to the same corpus and an oracle can't check it. Everything
here gates on **content hashes** instead: a row's fate is a pure
function of its id (and seed), so the sample is identical on any
cluster size, any partitioning, any engine with md5 — which is also
what makes these operators DuckDB-oracle-checkable (queries_text.py).

All operators are narrow (no shuffle): hash → compare/mod is a
per-row projection that pushes through scans, so sampling 1% of
100 TB reads 100 TB once but shuffles nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32_RANGE = float(2**32)


def _gate_u32(key: Column, seed: int) -> Column:
    """Uniform uint32 (as LONG) from the seeded md5 of ``key`` —
    first 8 hex digits parsed base-16, same fold as
    dedup.shingle_hashes32. DuckDB mirror:
    ``CAST(concat('0x', substring(md5('<seed>|' || key), 1, 8)) AS UBIGINT)``.
    """
    digest = F.md5(F.concat(F.lit(f"{seed}|"), key))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float | dict[str, float],
    seed: int = 0,
    strata_col: str | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a row iff ``u32(md5(seed|id)) < rate * 2^32``.

    ``rate`` may be a single float, or (with ``strata_col``) a
    {stratum value → rate} dict — per-language / per-source quotas,
    the standard curation move when rebalancing a corpus. Unlisted
    strata fall back to ``default_rate``.
    """
    u = _gate_u32(F.col(id_col).cast("string"), seed).cast("double")
    if isinstance(rate, dict):
        if strata_col is None:
            raise ValueError("dict rate requires strata_col")
        threshold = F.lit(default_rate * _U32_RANGE)
        for value, r in sorted(rate.items()):
            threshold = F.when(
                F.col(strata_col) == value, F.lit(r * _U32_RANGE)
            ).otherwise(threshold)
    else:
        threshold = F.lit(rate * _U32_RANGE)
    return df.filter(u < threshold)


def shard_assign(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0, out_col: str = "shard_id"
) -> DataFrame:
    """Add a uniform deterministic shard id in [0, n_shards): the
    writer-side partitioner for fixed-count training shards
    (``df.repartition(n, col).write.partitionBy(col)`` downstream).
    Uniformity comes from the hash, not the id distribution, so
    sequential or clustered ids still balance."""
    u = _gate_u32(F.col(id_col).cast("string"), seed)
    return df.withColumn(out_col, (u % n_shards).cast("int"))
