"""Deterministic-sampling / shard-assignment unit tests: rate
accuracy, reproducibility under repartitioning, uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.sampling import (
    deterministic_sample,
    global_shuffle_positions,
    mixture_resample,
    shard_assign,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_sample_rate_close_and_reproducible(spark):
    df = _ids(spark)
    kept = deterministic_sample(df, "doc_id", 0.25, seed=1)
    n = kept.count()
    assert 400 < n < 600  # 500 expected, hash-uniform
    # identical under a different partitioning (the whole point)
    n2 = deterministic_sample(df.repartition(7), "doc_id", 0.25, seed=1).count()
    assert n2 == n
    ids_a = {r.doc_id for r in kept.collect()}
    ids_b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.25, seed=1).collect()}
    assert ids_a == ids_b


def test_sample_seed_changes_selection(spark):
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.25, seed=1).collect()}
    b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.25, seed=2).collect()}
    assert a != b


def test_stratified_rates_and_default(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("xx").alias("lang"),
    )
    kept = deterministic_sample(
        df, "doc_id", {"en": 0.9, "de": 0.1}, seed=0, strata_col="lang",
        default_rate=0.0,
    )
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("xx", 0) == 0  # default rate 0 → stratum dropped
    assert 850 < counts["en"] <= 1000
    assert 50 < counts["de"] < 150


def test_dict_rate_requires_strata_col(spark):
    with pytest.raises(ValueError, match="strata_col"):
        deterministic_sample(_ids(spark), "doc_id", {"en": 0.5})


def test_shard_assign_uniform_and_total(spark):
    df = _ids(spark)
    per = shard_assign(df, "doc_id", 16).groupBy("shard_id").count().collect()
    assert len(per) == 16
    assert sum(r["count"] for r in per) == 2000
    assert all(80 < r["count"] < 170 for r in per)  # 125 expected


def test_mixture_resample_copy_counts(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "a").when(F.col("id") % 4 == 1, "b")
        .when(F.col("id") % 4 == 2, "c").otherwise("z").alias("src"),
    )
    out = mixture_resample(
        df, "doc_id", "src", {"a": 2.5, "b": 0.25, "c": 0.0}, seed=3, default=1.0
    )
    per = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # 1000 rows/stratum: a → 2500±, b → 250±, c dropped, default z → exactly 1000
    assert 2350 < per["a"] < 2650
    assert 180 < per["b"] < 330
    assert "c" not in per
    assert per["z"] == 1000
    # per-row copy count is floor(w) or floor(w)+1, copy_ids contiguous from 1
    mx = out.filter(F.col("src") == "a").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_id").alias("m"), F.min("copy_id").alias("lo")
    )
    bad = mx.filter(~F.col("n").isin(2, 3) | (F.col("m") != F.col("n")) | (F.col("lo") != 1))
    assert bad.count() == 0
    # deterministic under repartitioning
    n2 = mixture_resample(
        df.repartition(7), "doc_id", "src", {"a": 2.5, "b": 0.25, "c": 0.0}, seed=3
    ).count()
    assert n2 == out.count()


def test_global_shuffle_is_exact_permutation(spark):
    df = _ids(spark, 1000)
    out = global_shuffle_positions(df, "doc_id", shard_size=64, seed=9)
    rows = out.collect()
    assert sorted(r.rn for r in rows) == list(range(1000))
    assert all(r.shard_id == r.rn // 64 and r.pos == r.rn % 64 for r in rows)
    # two-phase bucketed rank must be bit-equal to the naive global order
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit("gshuf9|"), F.col("doc_id").cast("string")))
    naive = df.select(
        "doc_id",
        (F.row_number().over(Window.orderBy(key.alias("k"), "doc_id")) - 1).alias("rn"),
    )
    got = {r.doc_id: r.rn for r in rows}
    assert all(got[r.doc_id] == r.rn for r in naive.collect())


def test_weighted_keep_huge_weight_always_kept(spark):
    """Weights far past the always-keep bound must be kept — before
    the clamp, w ≥ ~2^31/rate_num wrapped the BIGINT threshold
    negative in non-ANSI Spark and silently dropped exactly the rows
    the gate should always keep."""
    from hz_csv2parquet_spark.operators.sampling import weighted_keep_flag, weighted_sample

    df = spark.createDataFrame(
        [(1, 2**40), (2, 2**62), (3, 1334), (4, 0)], "doc_id long, w long"
    )
    kept = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 3, 4000, seed=7).collect()}
    assert {1, 2, 3} <= kept  # w ≥ ⌈4000/3⌉ = 1334 ⇒ threshold saturates at 2^32
    assert 4 not in kept  # zero weight ⇒ threshold 0 ⇒ never kept
    # flag form agrees with the filter form
    flags = {
        r.doc_id: r.k
        for r in df.select(
            "doc_id", weighted_keep_flag("doc_id", "w", 3, 4000, seed=7).alias("k")
        ).collect()
    }
    assert flags == {i: (i in kept) for i in (1, 2, 3, 4)}


def test_weighted_keep_rejects_unsafe_rates(spark):
    from hz_csv2parquet_spark.operators.sampling import weighted_keep_flag

    with pytest.raises(ValueError):
        weighted_keep_flag("doc_id", "w", 1, 2**31)
    with pytest.raises(ValueError):
        weighted_keep_flag("doc_id", "w", 0, 10)
