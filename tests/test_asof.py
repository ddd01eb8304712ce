"""As-of join unit tests: boundary inclusion, missing-dim nulls,
multi-key independence."""

from __future__ import annotations

from hz_csv2parquet_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    facts = spark.createDataFrame(
        [(1, 5, "f1"), (1, 10, "f2"), (1, 20, "f3"), (2, 7, "f4"), (3, 9, "f5")],
        "k long, t long, fid string",
    )
    dims = spark.createDataFrame(
        [(1, 10, "d@10"), (1, 15, "d@15"), (2, 1, "d@1")],
        "k long, dt long, v string",
    )
    out = {
        r.fid: r.v
        for r in asof_join(facts, dims, "k", "t", "dt", ["v"]).collect()
    }
    assert out["f1"] is None  # no dim at or before t=5
    assert out["f2"] == "d@10"  # equal timestamp included ("at or before")
    assert out["f3"] == "d@15"  # latest prior wins
    assert out["f4"] == "d@1"  # keys independent
    assert out["f5"] is None  # key with no dims at all


def test_asof_preserves_fact_rows(spark):
    facts = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k long, t long, fid string")
    dims = spark.createDataFrame([(9, 0, "x")], "k long, dt long, v string")
    out = asof_join(facts, dims, "k", "t", "dt", ["v"])
    assert out.count() == 2  # left semantics: every fact row survives


def test_asof_payload_rows_are_atomic(spark):
    """A NULL inside the latest dim row must NOT be patched with an
    older dim row's value (per-column carry-forward would do exactly
    that); the whole dim row is carried as one struct — matching
    DuckDB's row-atomic ASOF JOIN."""
    facts = spark.createDataFrame([(1, 20, "f1")], "k long, t long, fid string")
    dims = spark.createDataFrame(
        [(1, 5, "old_v", "old_w"), (1, 10, None, "new_w")],
        "k long, dt long, v string, w string",
    )
    row = asof_join(facts, dims, "k", "t", "dt", ["v", "w"]).collect()[0]
    assert row.w == "new_w"
    assert row.v is None  # the newest dim row's NULL wins, atomically
