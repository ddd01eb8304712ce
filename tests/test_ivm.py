"""Incremental materialized-view maintenance (sources/ivm.py):
sum/count aggregates advanced by change-feed deltas — O(rows
changed) per refresh, exactly-once via txn markers, zero-count
groups leaving the view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.sources.ivm import IncrementalAggView
from hz_csv2parquet_spark.sources.txlog import TxTable


def _mk_source(spark, tmp_path, cdf=True):
    t = TxTable(
        spark, str(tmp_path / "src"), stat_cols=["grp"], change_data=cdf
    )
    t.create(
        spark.range(100)
        .selectExpr("id % 5 as grp", "id as amt")
        .repartition(2)
    )
    return t


def _expected(t):
    return {
        r.grp: (r.n, r.s)
        for r in t.snapshot()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s"))
        .collect()
    }


def _got(view):
    return {
        r.grp: (r.n_rows, r.sum_amt) for r in view.read().collect()
    }


def test_bootstrap_then_incremental_appends(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    assert v.last_applied() == -1
    assert v.refresh() is not None
    assert _got(v) == _expected(src)
    assert v.last_applied() == src.version()
    # two more source commits, ONE catch-up refresh
    src.append(spark.range(100, 120).selectExpr("id % 5 as grp", "id as amt"))
    src.append(spark.range(200, 210).selectExpr("cast(7 as bigint) as grp", "id as amt"))
    assert v.refresh() is not None
    assert _got(v) == _expected(src)
    assert 7 in _got(v)  # brand-new group entered the view


def test_refresh_is_idempotent_and_noop_when_current(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    assert v.refresh() is None  # already current
    # a second maintainer instance replaying the same range is a no-op
    v2 = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    assert v2.refresh() is None
    assert _got(v2) == _expected(src)


def test_deletes_subtract_and_zero_groups_leave(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    src.delete_where("grp = 2")  # the whole group vanishes
    src.delete_where("grp = 3 AND amt < 50")  # partial
    assert v.refresh() is not None
    got = _got(v)
    assert 2 not in got  # zero-count group LEFT the view
    assert got == _expected(src)


def test_updates_move_sums_not_counts(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    before = _got(v)
    src.update_where("grp = 1", {"amt": "amt + 1000"})
    v.refresh()
    got = _got(v)
    assert got[1][0] == before[1][0]  # count unchanged
    assert got[1][1] == before[1][1] + 1000 * before[1][0]
    assert got == _expected(src)


def test_works_without_cdf_via_content_diff(spark, tmp_path):
    """changes() falls back to content-diff recovery on plain
    tables — the view stays correct, cdf just makes it cheaper."""
    src = _mk_source(spark, tmp_path, cdf=False)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    src.delete_where("grp = 0")
    src.append(spark.range(300, 310).selectExpr("id % 5 as grp", "id as amt"))
    v.refresh()
    assert _got(v) == _expected(src)


def test_count_only_view_and_validation(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "cnt"), "grp")
    v.refresh()
    assert {r.grp: r.n_rows for r in v.read().collect()} == {
        g: n for g, (n, _) in _expected(src).items()
    }
    with pytest.raises(ValueError, match="group and sum"):
        IncrementalAggView(src, str(tmp_path / "bad"), "grp", ["grp"])
    with pytest.raises(ValueError, match="at least one"):
        IncrementalAggView(src, str(tmp_path / "bad2"), [])


def test_view_is_a_real_table_with_history(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    src.append(spark.range(500, 510).selectExpr("id % 5 as grp", "id as amt"))
    v.refresh()
    # time travel to the first materialization still works
    hist_rows = v.view.snapshot(as_of=1).groupBy().sum("n_rows").collect()
    assert hist_rows[0][0] == 100
    ops = [r.operation for r in v.view.history().collect()]
    assert ops[0] == "MERGE" and "CREATE" in ops


def test_cli_refresh_view(spark, tmp_path, capsys):
    from hz_csv2parquet_spark.cli import main

    src_csv = tmp_path / "t.csv"
    src_csv.write_text("grp,amt\n1,10\n1,20\n2,30\n")
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    assert main(["table", "create", src, "--src", str(src_csv),
                 "--stat-cols", "grp"]) == 0
    assert main(["table", "refresh-view", src, "--dest", view,
                 "--group-by", "grp", "--sum", "amt"]) == 0
    got = {
        r.grp: (r.n_rows, r.sum_amt)
        for r in TxTable(spark, view).snapshot().collect()
    }
    assert got == {1: (2, 30), 2: (1, 30)}
    # second invocation is a no-op (already current)
    assert main(["table", "refresh-view", src, "--dest", view,
                 "--group-by", "grp", "--sum", "amt"]) == 0


def test_property_random_dml_interleaved_with_refreshes(spark, tmp_path):
    """Property: any sequence of append/delete/update on the source,
    with refreshes at arbitrary points, leaves the view equal to a
    full recompute (hypothesis drives the op sequence)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    ops = st.lists(
        st.tuples(
            st.sampled_from(["append", "delete", "update", "refresh"]),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=3,
        max_size=6,
    )
    case = {"n": 0}

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(seq=ops)
    def run(seq):
        case["n"] += 1
        base = tmp_path / f"case{case['n']}"
        src = TxTable(
            spark, str(base / "src"), stat_cols=["grp"], change_data=True
        )
        src.create(
            spark.range(30).selectExpr("id % 4 as grp", "id as amt")
        )
        v = IncrementalAggView(src, str(base / "view"), "grp", ["amt"])
        nxt = 1000
        for op, arg in seq:
            if op == "append":
                src.append(
                    spark.range(nxt, nxt + 5 + arg).selectExpr(
                        "id % 4 as grp", "id as amt"
                    )
                )
                nxt += 100
            elif op == "delete":
                src.delete_where(f"amt % 10 = {arg}")
            elif op == "update":
                src.update_where(f"grp = {arg % 4}", {"amt": "amt + 7"})
            else:
                v.refresh()
        v.refresh()
        assert _got(v) == _expected(src)

    run()


def test_null_group_key_upserts_not_duplicates(spark, tmp_path):
    """Advisor r12 (high): a NULL group value is a real group. Before
    the null-safe surrogate merge key, (a) an all-NULL delta tripped
    merge_upsert's null-bounds emptiness shortcut — the batch was
    DISCARDED while the txn marker still advanced (permanent loss) —
    and (b) mixed deltas never matched the view's NULL-group row, so
    it duplicated instead of upserting. Exact repro from the advisory:
    view must show (null, 2, 17), not (null, 1, 10) or two rows."""
    src = TxTable(
        spark, str(tmp_path / "src"), stat_cols=["grp"], change_data=True
    )
    src.create(
        spark.createDataFrame(
            [(None, 10)], "grp INT, amt INT"
        )
    )
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    assert _got(v) == {None: (1, 10)}
    # an ALL-NULL-group delta: previously discarded with the marker
    # stamped — the loss was permanent (no re-refresh could see it)
    src.append(spark.createDataFrame([(None, 7)], "grp INT, amt INT"))
    v.refresh()
    assert _got(v) == {None: (2, 17)}
    # mixed delta: NULL group upserts next to a real key, one row each
    src.append(
        spark.createDataFrame([(None, 3), (1, 5)], "grp INT, amt INT")
    )
    v.refresh()
    assert _got(v) == {None: (3, 20), 1: (1, 5)}
    assert v.read().count() == 2
    # and the NULL group leaves the view when its count hits zero
    src.delete_where("grp IS NULL")
    v.refresh()
    assert _got(v) == {1: (1, 5)}


def test_null_groups_match_full_recompute_across_dml(spark, tmp_path):
    """NULL-group variant of the recompute property: interleave DML
    that creates, grows, shrinks and empties the NULL group."""
    src = TxTable(
        spark, str(tmp_path / "src"), stat_cols=["grp"], change_data=True
    )
    src.create(
        spark.range(40).selectExpr(
            "CASE WHEN id % 7 = 0 THEN NULL ELSE id % 3 END as grp",
            "id as amt",
        )
    )
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])
    v.refresh()
    assert _got(v) == _expected(src)
    src.update_where("grp = 1", {"grp": "NULL"})
    v.refresh()
    assert _got(v) == _expected(src)
    src.delete_where("grp IS NULL AND amt < 20")
    v.refresh()
    assert _got(v) == _expected(src)


def test_streaming_cdf_drives_continuous_refresh(spark, tmp_path):
    """Continuous view maintenance: tail the source's change feed as a
    STREAM and refresh the view from foreachBatch — the always-on
    shape of the nightly refresh. The batch content itself is not
    consumed (refresh() reads the feed range it needs); the stream is
    the TRIGGER, and exactly-once falls out of the txn-marker
    watermark — a replayed/overlapping trigger is a no-op."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    src = _mk_source(spark, tmp_path)
    v = IncrementalAggView(src, str(tmp_path / "view"), "grp", ["amt"])

    register_txlog_source(spark)

    def drive():
        q = (
            spark.readStream.format("hz_txlog")
            .option("readChangeFeed", "true")
            .load(src.path)
            .writeStream.foreachBatch(lambda _df, _bid: v.refresh())
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drive()
    assert _got(v) == _expected(src)
    # more source commits, another streaming pass: view follows
    src.append(spark.range(900, 930).selectExpr("id % 5 as grp", "id as amt"))
    src.delete_where("amt % 4 = 1")
    drive()
    assert _got(v) == _expected(src)
    # a pass with no new source commits is a clean no-op
    applied = v.last_applied()
    drive()
    assert v.last_applied() == applied


def test_timestamp_group_key_survives_session_tz_change(spark, tmp_path):
    """A TIMESTAMP group column (hourly rollup) must not re-key when
    the session timezone changes between refreshes — the surrogate
    key encodes epoch micros, not to_json's tz-formatted string."""
    src = TxTable(
        spark, str(tmp_path / "src"), stat_cols=["amt"], change_data=True
    )
    mk = lambda lo, hi: spark.sql(
        f"SELECT timestamp_micros(1700000000000000 + (id % 3) * 3600000000)"
        f" AS h, id AS amt FROM range({lo}, {hi})"
    )
    src.create(mk(0, 30))
    v = IncrementalAggView(src, str(tmp_path / "view"), "h", ["amt"])
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        v.refresh()
        assert v.read().count() == 3
        src.append(mk(100, 120))
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        v.refresh()  # same groups must UPSERT, not duplicate
        got = {
            r.h: (r.n_rows, r.sum_amt) for r in v.read().collect()
        }
        exp = {
            r.h: (r.n, r.s)
            for r in src.snapshot()
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s"))
            .collect()
        }
        assert got == exp and len(got) == 3
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_composite_group_key_with_partial_nulls(spark, tmp_path):
    """Two group columns where each can independently be NULL: the
    JSON surrogate key distinguishes (NULL, x) from (x, NULL) and
    from (NULL, NULL), and every combination upserts exactly."""
    src = TxTable(
        spark, str(tmp_path / "src"), stat_cols=["amt"], change_data=True
    )
    mk = lambda lo, hi: spark.sql(
        f"SELECT IF(id % 2 = 0, CAST(NULL AS BIGINT), id % 3) AS a, "
        f"IF(id % 3 = 0, CAST(NULL AS STRING), CAST(id % 2 AS STRING)) AS b, "
        f"id AS amt FROM range({lo}, {hi})"
    )
    src.create(mk(0, 40))
    v = IncrementalAggView(src, str(tmp_path / "view"), ["a", "b"], ["amt"])
    v.refresh()
    src.append(mk(100, 140))
    src.delete_where("amt % 5 = 2")
    v.refresh()
    got = {
        (r.a, r.b): (r.n_rows, r.sum_amt) for r in v.read().collect()
    }
    exp = {
        (r.a, r.b): (r.n, r.s)
        for r in src.snapshot()
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s"))
        .collect()
    }
    assert got == exp
    # each refresh merged (no duplicate group rows)
    assert v.read().count() == len(exp)
