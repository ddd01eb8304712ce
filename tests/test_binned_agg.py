"""Unit tests for the binned-aggregation operator: bin-edge cases,
median interpolation, prescale, out-of-range handling, geo wrapper."""

from __future__ import annotations

import pytest

from hz_csv2parquet_spark.operators.binned_agg import (
    BinSpec,
    binned_agg,
    geo_aggregate,
    meters_to_degrees,
)


def rows_to_dict(df, key_cols, val_col):
    return {tuple(r[k] for k in key_cols): r[val_col] for r in df.collect()}


def test_bin_edges_and_median_interpolation(spark):
    # bins of width 10 from 0: [0,10) [10,20) ...
    df = spark.createDataFrame(
        [(0.0, 1.0), (9.999, 2.0), (10.0, 3.0), (5.0, 4.0), (5.0, 6.0)],
        ["x", "v"],
    )
    out = binned_agg(df, [BinSpec("x", 0.0, 100.0, 10.0)], "v", mode="median")
    got = rows_to_dict(out, ["x_bin"], "v_median")
    # bin [0,10) holds v = {1,2,4,6} → even count, interpolated median = 3.0
    assert got[(5.0,)] == 3.0
    # 10.0 lands in [10,20) — lower edge inclusive for the *next* bin
    assert got[(15.0,)] == 3.0


def test_out_of_range_dropped_not_wrapped(spark):
    # the reference wraps x < lo into the LAST bin (negative indexing
    # bug, SURVEY.md §2.2); we drop — pin the deviation
    df = spark.createDataFrame([(-0.001, 99.0), (50.0, 1.0), (100.0, 98.0)], ["x", "v"])
    out = binned_agg(df, [BinSpec("x", 0.0, 100.0, 10.0)], "v", mode="max")
    got = rows_to_dict(out, ["x_bin"], "v_max")
    assert got == {(55.0,): 1.0}


def test_prescale_and_mean(spark):
    df = spark.createDataFrame([(1.0, 10.0), (1.0, 30.0)], ["x", "v"])
    out = binned_agg(
        df, [BinSpec("x", 0.0, 10.0, 10.0)], "v", mode="mean", prescale=10.0
    )
    [r] = out.collect()
    assert r["v_mean"] == 2.0  # (1 + 3) / 2


def test_mode_whitelist(spark):
    df = spark.createDataFrame([(1.0, 1.0)], ["x", "v"])
    with pytest.raises(ValueError):
        binned_agg(df, [BinSpec("x", 0.0, 10.0, 1.0)], "v", mode="stddev")


def test_geo_aggregate_reference_surface(spark):
    # 10m grid ≈ 8.98e-5 deg; two points in the same cell, one far away
    step = meters_to_degrees(10.0)
    df = spark.createDataFrame(
        [
            (0.00001, 0.00001, 10.0),
            (0.00002, 0.00002, 20.0),
            (45.0, 90.0, 70.0),
            (95.0, 0.0, 999.0),  # out of range → dropped, not wrapped
        ],
        ["Latitude", "Longitude", "Data"],
    )
    out = geo_aggregate(df, grid_meters=10.0, mode="median")
    assert out.columns == ["Data", "Latitude", "Longitude"]
    rows = {round(r["Data"], 9): r for r in out.collect()}
    # JDS prescale: Data/10 → median(1, 2) = 1.5
    assert 1.5 in rows
    assert 7.0 in rows
    assert len(rows) == 2
    near = rows[1.5]
    import math

    exp_lat = (math.floor((0.00001 - -90.0) / step) + 0.5) * step + -90.0
    exp_lon = (math.floor((0.00001 - -180.0) / step) + 0.5) * step + -180.0
    assert near["Latitude"] == exp_lat
    assert near["Longitude"] == exp_lon
    # both sample points fall in the same cell ⇒ center within step of them
    assert abs(near["Latitude"] - 0.00001) < step
    assert abs(near["Longitude"] - 0.00001) < step


def test_collate_equals_union_aggregate(spark):
    # property: per-file collate == aggregate over the union (global bins)
    a = spark.createDataFrame([(1.0, 1.0), (2.0, 3.0)], ["x", "v"])
    b = spark.createDataFrame([(1.5, 5.0), (11.0, 7.0)], ["x", "v"])
    spec = [BinSpec("x", 0.0, 100.0, 10.0)]
    direct = binned_agg(a.unionByName(b), spec, "v", mode="mean")
    got = rows_to_dict(direct, ["x_bin"], "v_mean")
    assert got == {(5.0,): 3.0, (15.0,): 7.0}
