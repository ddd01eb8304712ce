"""Column mapping (sources/txlog.py): metadata-only RENAME/DROP
COLUMN — the Delta columnMapping name-mode contract. Data files,
hive dirs, partitionValues and stats keys hold PHYSICAL names that
never change; the committed schema and every user-facing predicate
speak LOGICAL names; one meta action holds the map. At 100 TB the
alternative to these O(1) commits is rewriting every data file."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.sources.txlog import (
    TableFeatureError,
    TxTable,
    _version_file,
)


def _mk(spark, tmp_path, n=100, files=4, **kw):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"], **kw)
    df = (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(files)
    )
    t.create(df)
    return t


def _data_files(t):
    return {f: os.path.getmtime(f) for f in t.files()}


def test_rename_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _data_files(t)
    t.rename_column("v", "value")
    # zero data movement: same files, same bytes (mtimes untouched)
    assert _data_files(t) == before
    snap = t.snapshot()
    assert snap.columns == ["k", "value"]
    assert {r.value for r in snap.collect()} == {2 * i for i in range(100)}
    # the upgrade records the required reader feature
    assert "columnMapping" in t._replay_state()["readerFeatures"]


def test_rename_then_append_mixes_generations(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "value")
    t.append(
        spark.range(10, 20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("value")
        )
    )
    snap = t.snapshot()
    assert snap.columns == ["k", "value"]
    assert {(r.k, r.value) for r in snap.collect()} == {
        (i, 2 * i) for i in range(20)
    }
    # the new file stored the PHYSICAL name (v), not the logical one —
    # that's what makes the next rename O(1) too
    import pyarrow.parquet as pq

    newest = max(t.files(), key=os.path.getmtime)
    assert "v" in pq.read_schema(newest).names
    assert "value" not in pq.read_schema(newest).names


def test_rename_validations(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("missing", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    t.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="v_pos"):
        t.rename_column("v", "value")
    t.drop_constraint("v_pos")
    assert t.rename_column("v", "value") == t.version()


def test_time_travel_sees_historical_names(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "value")
    assert t.snapshot().columns == ["k", "value"]
    assert t.snapshot(as_of=0).columns == ["k", "v"]
    assert {r.v for r in t.snapshot(as_of=0).collect()} == {
        2 * i for i in range(10)
    }


def test_chained_renames_and_rename_back(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    t.rename_column("v", "a")
    t.rename_column("a", "b")
    t.rename_column("b", "v")  # full circle
    snap = t.snapshot()
    assert snap.columns == ["k", "v"]
    assert {r.v for r in snap.collect()} == {0, 2, 4, 6, 8}


def test_drop_column_is_metadata_only_and_never_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    before = _data_files(t)
    t.drop_column("v")
    assert _data_files(t) == before
    assert t.snapshot().columns == ["k"]
    # re-add the SAME logical name: fresh physical id, old bytes stay
    # invisible (the resurrect hazard the fresh col-<id> rule blocks)
    t.evolve_schema(
        spark.createDataFrame([(100, -1)], "k long, v long")
    )
    snap = t.snapshot()
    assert snap.columns == ["k", "v"]
    rows = {(r.k, r.v) for r in snap.collect()}
    assert (100, -1) in rows
    # the 10 original rows must surface v as NULL, not the dropped data
    assert all(v is None for k, v in rows if k < 100)


def test_drop_validations(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("missing")
    t.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="v_pos"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    t.drop_column("v")
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("k")


def test_rename_partition_column(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "k long, p string, v long"
    )
    t.create(df, partition_by=["p"])
    t.rename_column("p", "part")
    assert t.partition_columns() == ["part"]
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "part", "v"}
    assert {(r.k, r.part) for r in snap.collect()} == {
        (1, "a"), (2, "b"), (3, "a")
    }
    # partition pruning still works through the logical name
    assert snap.filter(F.col("part") == "a").count() == 2
    # hive dirs on disk still carry the physical name
    assert any("p=a" in f for f in t.files())
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("part")
    # appends land under the physical dir layout
    t.append(spark.createDataFrame([(4, "c", 40)], "k long, part string, v long"))
    assert any("p=c" in f for f in t.files())
    assert t.snapshot().filter(F.col("part") == "c").count() == 1


def test_delete_update_and_stats_skipping_after_rename(spark, tmp_path):
    # range-clustered files so k-stats are selective
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = (
        spark.range(400)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t.create(df)
    t.rename_column("k", "key")
    t.rename_column("v", "val")
    # stats skipping translates the logical predicate to physical
    # stats keys: a key=5 DELETE touches exactly one file
    files_before = set(t.files())
    t.delete_where("key = 5")
    untouched = files_before & set(t.files())
    assert len(untouched) == 3
    snap = t.snapshot()
    assert snap.filter("key = 5").count() == 0
    assert snap.count() == 399
    # pruned_files speaks logical too
    hit, miss = t.pruned_files("key", 5, 5)
    assert len(miss) >= 2
    # UPDATE with logical names in predicate and assignment
    t.update_where("key = 6", {"val": "val + 1000"})
    assert t.snapshot().filter("key = 6").collect()[0].val == 1012


def test_dv_delete_after_rename(spark, tmp_path):
    t = TxTable(
        spark, str(tmp_path / "tbl"), stat_cols=["k"], deletion_vectors=True
    )
    t.create(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
    )
    t.rename_column("v", "val")
    files_before = set(t.files())
    t.delete_where("val >= 100")  # k >= 50, merge-on-read
    assert set(t.files()) == files_before  # dv: no rewrite
    snap = t.snapshot()
    assert snap.count() == 50
    assert snap.filter("val >= 100").count() == 0
    # compact materializes the vector away, round-tripping physical
    t.compact(target_files=1)
    assert t.snapshot().count() == 50
    assert t.snapshot().columns == ["k", "val"]


def test_merge_after_rename_and_widening_merge(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=2)
    t.rename_column("v", "val")
    t.merge_upsert(
        spark.createDataFrame([(5, -5), (200, -200)], "k long, val long"), "k"
    )
    snap = t.snapshot()
    assert snap.count() == 101
    got = {r.k: r.val for r in snap.collect()}
    assert got[5] == -5 and got[200] == -200 and got[6] == 12
    # widening merge: the new column gets a FRESH physical id
    t.merge_upsert(
        spark.createDataFrame([(7, -7, "x")], "k long, val long, tag string"),
        "k",
    )
    state = t._replay_state()
    phys = state["columnMapping"]["physical"]
    assert phys["tag"].startswith("col-")
    snap = t.snapshot()
    assert {r.tag for r in snap.filter("k = 7").collect()} == {"x"}
    assert snap.filter("tag is null").count() == 100


def test_cdf_across_a_rename(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"), change_data=True, stat_cols=["k"])
    t.create(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
    )
    t.delete_where("k = 3")  # v1: cdc sidecar written pre-rename
    t.rename_column("v", "val")  # v2: metadata only
    t.delete_where("k = 4")  # v3: sidecar written post-rename
    feed = t.changes(0)
    # ONE logical schema (the range head's) across both generations
    assert set(feed.columns) == {"k", "val", "_change_type", "_commit_version"}
    rows = {(r.k, r.val, r._change_type, r._commit_version) for r in feed.collect()}
    assert (3, 6, "delete", 1) in rows
    assert (4, 8, "delete", 3) in rows


def test_restore_rolls_the_rename_back(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "val")
    assert t.snapshot().columns == ["k", "val"]
    t.restore(0)
    assert t.snapshot().columns == ["k", "v"]
    assert t._replay_state().get("columnMapping") is None
    # and time travel still sees the renamed era
    assert t.snapshot(as_of=1).columns == ["k", "val"]


def test_checkpoint_carries_the_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "val")
    t._write_checkpoint(t.version())
    fresh = TxTable(spark, t.path)
    state = fresh._replay_state()
    assert state["columnMapping"]["physical"] == {"k": "k", "val": "v"}
    assert fresh.snapshot().columns == ["k", "val"]
    # checkpoint-accelerated: the replay read no commit files
    assert fresh.log_reads == 0


def test_old_reader_fails_closed_on_mapped_tables(spark, tmp_path):
    """A mapping-unaware reader must refuse, not serve stale names —
    simulated by shrinking SUPPORTED_READER_FEATURES to the
    pre-round-11 set."""
    import hz_csv2parquet_spark.sources.txlog as txmod

    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "val")
    old = txmod.SUPPORTED_READER_FEATURES
    txmod.SUPPORTED_READER_FEATURES = frozenset(
        {"deletionVectors", "hivePartitioning"}
    )
    try:
        with pytest.raises(TableFeatureError, match="columnMapping"):
            t.snapshot()
    finally:
        txmod.SUPPORTED_READER_FEATURES = old


def test_dsv2_source_reads_and_writes_mapped_tables(spark, tmp_path):
    """The hz_txlog DSv2 READ path resolves the mapping (executors
    select by physical name, serve logical); the SINK stages parquet
    under PHYSICAL names; evolve-through-sink (columns the mapping
    does not name) fails closed at writer construction."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = _mk(spark, tmp_path, n=10, files=1)
    t.rename_column("v", "val")
    df = spark.read.format("hz_txlog").load(t.path)
    assert df.columns == ["k", "val"]
    assert {(r.k, r.val) for r in df.collect()} == {(i, 2 * i) for i in range(10)}
    # time travel reads the historical logical names
    old = spark.read.format("hz_txlog").option("asOf", "0").load(t.path)
    assert old.columns == ["k", "v"]
    # the sink writes the mapped table under physical names
    spark.createDataFrame([(100, 200)], "k long, val long").write.format(
        "hz_txlog"
    ).mode("append").save(t.path)
    snap = t.snapshot()
    assert snap.count() == 11
    assert snap.filter("val = 200").collect()[0].k == 100
    import pyarrow.parquet as pq

    newest = max(t.files(), key=os.path.getmtime)
    assert "v" in pq.read_schema(newest).names  # physical on disk
    # a column outside the mapping cannot get a physical id here
    with pytest.raises(Exception, match="evolve_schema"):
        spark.createDataFrame(
            [(1, 1, "x")], "k long, val long, tag string"
        ).write.format("hz_txlog").mode("append").save(t.path)
    assert t.snapshot().count() == 11  # nothing landed


def test_dsv2_sink_partitioned_write_after_partition_rename(spark, tmp_path):
    """Partitioned sink writes land under PHYSICAL hive dirs with
    physical partitionValues keys — pruning and reads stay coherent
    across the rename."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(
        spark.createDataFrame([(1, "a", 10)], "k long, p string, v long"),
        partition_by=["p"],
    )
    t.rename_column("p", "part")
    spark.createDataFrame([(2, "b", 20)], "k long, part string, v long").write.format(
        "hz_txlog"
    ).mode("append").save(t.path)
    assert any("p=b" in f for f in t.files())  # physical dir name
    snap = t.snapshot()
    assert {(r.k, r.part) for r in snap.collect()} == {(1, "a"), (2, "b")}
    assert snap.filter("part = 'b'").count() == 1
    # constraints on the renamed partition column enforce sink-side
    t.add_constraint("part_small", "part < 'z'")
    with pytest.raises(Exception, match="part_small"):
        spark.createDataFrame(
            [(3, "zz", 30)], "k long, part string, v long"
        ).write.format("hz_txlog").mode("append").save(t.path)
    assert t.snapshot().count() == 2


def test_dsv2_pushdown_and_partitions_after_rename(spark, tmp_path):
    """Filter pushdown translates logical predicates to physical
    stats keys; partition constants re-key from physical hive values
    to logical columns."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
            "k long, p string, v long",
        ),
        partition_by=["p"],
    )
    t.rename_column("p", "part")
    t.rename_column("v", "val")
    df = spark.read.format("hz_txlog").load(t.path)
    assert set(df.columns) == {"k", "part", "val"}
    got = {(r.k, r.part, r.val) for r in df.filter("part = 'a'").collect()}
    assert got == {(1, "a", 10), (3, "a", 30)}


def test_dsv2_cdf_stream_across_rename(spark, tmp_path):
    """readChangeFeed serves pre- and post-rename sidecars under ONE
    logical schema (physical names are version-invariant)."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = TxTable(spark, str(tmp_path / "tbl"), change_data=True, stat_cols=["k"])
    t.create(
        spark.range(6).selectExpr("id AS k", "id*2 AS v").coalesce(1)
    )
    t.delete_where("k = 1")  # sidecar pre-rename
    t.rename_column("v", "val")
    t.delete_where("k = 2")  # sidecar post-rename
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("hz_txlog")
        .option("readChangeFeed", "true")
        .option("skipChangeCommits", "false")
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"k", "val", "_change_type", "_commit_version"}
    dels = {
        (r.k, r.val, r._commit_version)
        for r in got.filter("_change_type = 'delete'").collect()
    }
    assert dels == {(1, 2, 1), (2, 4, 3)}


def test_rename_conflicts_racing_dml(spark, tmp_path, monkeypatch):
    """A RENAME committed between a DML's staging and its commit
    changes schema+mapping — read-set validation must surface the
    conflict, never rebase staged physical files past it."""
    from hz_csv2parquet_spark.sources.txlog import CommitConflictError

    t = _mk(spark, tmp_path, n=10, files=1)
    other = TxTable(spark, t.path, stat_cols=["k"])
    real_commit = TxTable._commit
    state = {"injected": False}

    def racing_commit(self, actions, expected_version, operation=None):
        if not state["injected"] and self is t and operation == "DELETE":
            state["injected"] = True
            other.rename_column("v", "val")
        return real_commit(self, actions, expected_version, operation=operation)

    monkeypatch.setattr(TxTable, "_commit", racing_commit)
    with pytest.raises(CommitConflictError):
        t.delete_where("k = 5")


def test_evolve_under_mapping_skips_squatted_ids(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(spark.createDataFrame([(1, 2)], "k long, `col-1` long"))
    t.rename_column("col-1", "renamed")
    t.evolve_schema(spark.createDataFrame([(2, 3, 4)], "k long, renamed long, extra long"))
    phys = t._replay_state()["columnMapping"]["physical"]
    # the generated id skipped the user column squatting col-1
    assert phys["extra"] == "col-2"
    snap = t.snapshot()
    assert {(r.k, r.renamed) for r in snap.collect()} == {(1, 2), (2, 3)}


def test_oracle_parity_after_rename(spark, tmp_path):
    """Value-level parity: the renamed table equals DuckDB over the
    physically-named parquet files with the rename applied in SQL."""
    import duckdb

    t = _mk(spark, tmp_path, n=50, files=2)
    t.rename_column("v", "val")
    t.delete_where("val > 80")
    got = sorted((r.k, r.val) for r in t.snapshot().collect())
    con = duckdb.connect()
    files = [f.replace("'", "''") for f in t.files()]
    lst = ", ".join(f"'{f}'" for f in files)
    want = con.execute(
        f"SELECT k, v AS val FROM read_parquet([{lst}]) "
        "WHERE v <= 80 ORDER BY k, val"
    ).fetchall()
    assert got == [tuple(w) for w in want]
