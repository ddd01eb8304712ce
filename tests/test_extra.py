"""Extended-surface tests: bucketed-join layout and approx-quantile
accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.queries import REGISTRY


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # at fixture size Spark rightly broadcasts the small side; the
    # bucketed layout must still be recognized by the scans
    df = REGISTRY["bucketed_join_revenue"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Bucketed: true") == 2

    # the big-big shape (both sides too large to broadcast): the
    # bucket-aware sort-merge join needs NO exchange and NO sort on
    # the join key — simulate by disabling broadcast, scoped
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        import hashlib

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        bo = spark.table(f"hz_b_orders_{tag}")
        bc = spark.table(f"hz_b_customer_{tag}")
        j = bo.join(bc, bo.o_custkey == bc.c_custkey)
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p
        assert "Exchange hashpartitioning" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    approx = {
        r.c_mktsegment: r.p50_approx
        for r in REGISTRY["approx_percentiles_by_segment"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.c_mktsegment: r.p50
        for r in REGISTRY["percentiles_by_segment"].fn(spark, sf_dir).collect()
    }
    for seg, p in exact.items():
        # 10k accuracy on ~30-300 rows/group: effectively exact
        assert approx[seg] == pytest.approx(p, rel=0.05, abs=50.0), seg


def test_partition_by_layout(spark, tmp_path):
    import os

    from hz_csv2parquet_spark.sources.io import read_table, write_table
    from hz_csv2parquet_spark.tables import table as t

    df = t(spark, "/root/testdata/sf0.001", "customer")
    out = str(tmp_path / "cust_part")
    write_table(df, out, fmt="parquet", partition_by=["c_mktsegment"])
    dirs = {d for d in os.listdir(out) if d.startswith("c_mktsegment=")}
    assert len(dirs) == 5  # hive-style layout, one dir per segment
    back = read_table(spark, out, fmt="parquet")
    assert back.count() == df.count()
    # partition pruning: filtering on the partition col reads one dir
    plan = (
        back.filter(F.col("c_mktsegment") == "BUILDING")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan


def test_approx_distinct_within_rsd(spark, sf_dir):
    from hz_csv2parquet_spark.queries import REGISTRY

    approx = {
        r.event_type: r.n_users_approx
        for r in REGISTRY["approx_distinct_users_per_type"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in REGISTRY["distinct_users_per_type"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 2), (k, approx[k], exact[k])
