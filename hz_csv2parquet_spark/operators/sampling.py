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

from pyspark.sql import Column, DataFrame, Window
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


def mixture_resample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    seed: int = 0,
    default: float = 1.0,
) -> DataFrame:
    """Weighted mixture resampling WITH replacement — the data-mixing
    pass that turns per-source epoch weights (à la the Pile /
    DoReMi-style mixtures) into a physical corpus: weight 2.5 means
    every row appears twice and a deterministic 50% of rows a third
    time; weight 0.25 keeps a deterministic quarter.

    copies(row) = ⌊w⌋ + [u32(md5(seed|id)) < frac(w)·2³²] — the
    fractional part is a content-hash gate (no rand(), identical
    under retry/AQE/engine), and the integer threshold is computed
    once driver-side so both engines compare exact integers. Rows
    explode into (row, copy_id 1..n); weight-0 strata drop out.
    Narrow: hash → explode, no shuffle; output size = Σ wᵢ·|stratumᵢ|.
    """
    u = _gate_u32(F.col(id_col).cast("string"), seed)
    floor_expr = F.lit(int(default))
    fthr_expr = F.lit(int((default - int(default)) * 2**32))
    for v, w in sorted(weights.items()):
        floor_expr = F.when(F.col(strata_col) == v, F.lit(int(w))).otherwise(floor_expr)
        fthr_expr = F.when(
            F.col(strata_col) == v, F.lit(int((w - int(w)) * 2**32))
        ).otherwise(fthr_expr)
    n = floor_expr + F.when(u < fthr_expr, F.lit(1)).otherwise(F.lit(0))
    # sequence(1, 0) would count DOWN in Spark — guard empty strata
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy_id", F.explode(copies))


def global_shuffle_positions(
    df: DataFrame, id_col: str, shard_size: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle → contiguous training shards:
    every row gets a position in the md5-of-id total order, and
    shards are contiguous ``shard_size``-row slices of it — the
    "shuffle once, stream shards sequentially" layout a training run
    wants (any prefix of shards is itself an unbiased sample).

    A naive global ``row_number() OVER (ORDER BY key)`` is a
    single-task sort at 100 TB, so this is the two-phase scalable
    form of the same number:

    1. bucket = first byte of the shuffle key → 256 hash-prefix
       buckets, each a contiguous slice of the global key order
       (hex-lex order == bucket-integer order);
    2. per-bucket row counts → cumulative offsets — a 256-row frame
       (single tiny window) broadcast back;
    3. position = bucket offset + rank within bucket, where the
       within-bucket ranks run in parallel across buckets (one
       shuffle keyed on the bucket id).

    The result is bit-equal to the naive global ROW_NUMBER — which is
    exactly what the DuckDB oracle runs. For deeper parallelism raise
    the prefix to 2 bytes (65 536 buckets); the offsets frame stays
    driver-trivial either way.

    Output: (id_col, rn [0-based global position], shard_id, pos
    [position within shard]).
    """
    key = F.md5(F.concat(F.lit(f"gshuf{seed}|"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        key.alias("__key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("__bkt"),
    )
    counts = base.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    cum = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bkt", F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias("__off")
    )
    within = Window.partitionBy("__bkt").orderBy("__key", id_col)
    ranked = (
        base.join(F.broadcast(offsets), "__bkt")
        .withColumn("__rn", F.row_number().over(within) + F.col("__off") - 1)
    )
    return ranked.select(
        id_col,
        F.col("__rn").cast("long").alias("rn"),
        F.floor(F.col("__rn") / shard_size).cast("int").alias("shard_id"),
        (F.col("__rn") % shard_size).cast("long").alias("pos"),
    )


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


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    rate_num: int,
    rate_den: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Poisson sampling with per-row inclusion
    probability ∝ an integer weight: keep iff
    ``u32(md5(seed|id)) < min(2³², w · rate_num·2³² / rate_den)``.

    The threshold is computed in pure integer arithmetic
    (``(w · rate_num·2³²) div rate_den``), so the keep decision is
    bit-identical on any engine with md5 — no floats, no rand(). A
    row with weight ≥ rate_den/rate_num is always kept (threshold
    caps at 2³²). This is the quality-weighted curation gate: e.g.
    ``weight_col=n_chars, rate_num=3, rate_den=4000`` keeps a
    400-char doc with p≈0.3 and a 2000-char doc always.

    Like every gate here it is narrow — a per-row filter that pushes
    through scans; sampling 100 TB shuffles nothing.
    """
    return df.filter(weighted_keep_flag(id_col, weight_col, rate_num, rate_den, seed))


def weighted_keep_flag(
    id_col: str, weight_col: str, rate_num: int, rate_den: int, seed: int = 0
) -> Column:
    """The boolean keep decision behind :func:`weighted_sample`,
    exposed as a column so census-style queries can aggregate over
    kept AND dropped rows in one narrow pass (no join-back against
    the filtered frame).

    The weight is clamped at ⌈rate_den/rate_num⌉ BEFORE the multiply:
    any weight at or past that bound already saturates the threshold
    at 2³² (always kept), and the clamp keeps
    ``w · rate_num·2³²`` ≤ (rate_den + rate_num)·2³² < 2⁶³, so the
    BIGINT arithmetic cannot wrap — unclamped, a weight ≥
    ~2³¹/rate_num silently went negative in non-ANSI Spark (row
    always dropped) while DuckDB raised, a cross-engine divergence
    on exactly the rows the gate should always keep."""
    if rate_num <= 0 or rate_den <= 0:
        raise ValueError("rate_num and rate_den must be positive")
    if rate_den + rate_num >= 2**31:
        raise ValueError("rate_den too large: threshold arithmetic needs rate_den + rate_num < 2^31")
    w_cap = (rate_den + rate_num - 1) // rate_num
    u = _gate_u32(F.col(id_col).cast("string"), seed)
    thr = F.least(
        F.lit(2**32).cast("long"),
        F.expr(
            f"(least(CAST({weight_col} AS BIGINT), {w_cap}) * {rate_num * 2**32})"
            f" div {rate_den}"
        ),
    )
    return u < thr
