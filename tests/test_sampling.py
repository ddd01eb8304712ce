"""Deterministic-sampling / shard-assignment unit tests: rate
accuracy, reproducibility under repartitioning, uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.sampling import deterministic_sample, shard_assign


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
