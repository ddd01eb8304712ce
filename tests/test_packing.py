"""Sequence-packing + salted-aggregation unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.packing import pack_assignment, salted_sum


def test_pack_boundaries_exact(spark):
    # sizes 600+600+600 = 1800; budget 1000: doc 3 starts at 1200 → pack 1
    df = spark.createDataFrame(
        [(1, 600), (2, 600), (3, 600), (4, 400)], "doc_id bigint, sz bigint"
    )
    rows = {
        r.doc_id: r
        for r in pack_assignment(df, "sz", 1000, order_cols=["doc_id"]).collect()
    }
    assert (rows[1].pack_id, rows[1].pack_offset) == (0, 0)
    assert (rows[2].pack_id, rows[2].pack_offset) == (0, 600)
    assert (rows[3].pack_id, rows[3].pack_offset) == (1, 200)
    # doc 4 starts exactly at 1800 → pack 1 (straddles into 2)
    assert (rows[4].pack_id, rows[4].pack_offset) == (1, 800)


def test_pack_start_exactly_on_budget(spark):
    # doc 2 starts exactly at the budget boundary → first row of pack 1
    df = spark.createDataFrame([(1, 1000), (2, 50)], "doc_id bigint, sz bigint")
    rows = {
        r.doc_id: r
        for r in pack_assignment(df, "sz", 1000, order_cols=["doc_id"]).collect()
    }
    assert (rows[2].pack_id, rows[2].pack_offset) == (1, 0)


def test_pack_is_per_shard(spark):
    df = spark.createDataFrame(
        [(1, "a", 900), (2, "b", 900), (3, "a", 900), (4, "b", 900)],
        "doc_id bigint, shard string, sz bigint",
    )
    rows = {
        r.doc_id: r
        for r in pack_assignment(
            df, "sz", 1000, order_cols=["doc_id"], shard_col="shard"
        ).collect()
    }
    # each shard's stream restarts at 0
    assert rows[1].pack_offset == 0 and rows[2].pack_offset == 0
    assert rows[3].pack_id == 0 and rows[3].pack_offset == 900
    assert rows[4].pack_id == 0 and rows[4].pack_offset == 900


def test_salted_sum_matches_plain_groupby(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    salted = salted_sum(
        df,
        ["k"],
        {"n": F.lit(1), "total": F.col("v")},
        salt_col=F.col("v"),
        n_salts=16,
    )
    plain = df.groupBy("k").agg(F.sum(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}
