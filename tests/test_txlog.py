"""Transaction-log table layer (sources/txlog.py): ACID commits,
snapshot isolation, time travel, stats-pruned MERGE, atomic
compaction, schema evolution, vacuum, and the optimistic-concurrency
conflict. The layer is the production story behind the simulated
lakehouse catalog queries (SURVEY E105/E126/E127)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.sources.txlog import (
    CommitConflictError,
    TxTable,
    _version_file,
)


def _mk(spark, tmp_path, n=100, files=4):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(files)
    t.create(df)
    return t


def test_create_snapshot_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap = t.snapshot()
    assert snap.count() == 100
    assert {r.k for r in snap.collect()} == set(range(100))
    assert t.version() == 0
    assert len(t.files()) == 4


def test_append_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=2)
    t.append(spark.range(50, 80).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    assert t.version() == 1
    assert t.snapshot().count() == 80
    assert t.snapshot(as_of=0).count() == 50  # time travel


def test_merge_upsert_rewrites_only_touched_files(spark, tmp_path):
    # 4 files over disjoint k ranges (repartitionByRange + sort gives
    # range-clustered files whose min/max stats are selective)
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = (
        spark.range(400)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t.create(df)
    files_before = set(t.files())
    assert len(files_before) == 4

    # updates hit only the low range [0, 40]
    updates = spark.range(0, 41, 2).select(F.col("k" if False else "id").alias("k"), F.lit(-1).alias("v"))
    touched, skipped = t.pruned_files("k", 0, 40)
    assert len(touched) == 1 and len(skipped) == 3, "stats pruning must isolate one file"

    t.merge_upsert(updates, "k")
    snap = t.snapshot()
    assert snap.count() == 400  # pure SCD1 upsert of existing keys
    got = {r.k: r.v for r in snap.collect()}
    for k in range(0, 41, 2):
        assert got[k] == -1
    for k in range(41, 400):
        assert got[k] == 2 * k
    # untouched files survive as-is; exactly the one touched file was removed
    files_after = set(t.files())
    assert len(files_before & files_after) == 3


def test_merge_inserts_new_keys(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    ups = spark.createDataFrame([(5, -5), (100, -100)], "k long, v long")
    t.merge_upsert(ups, "k")
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got[5] == -5 and got[100] == -100 and len(got) == 11


def test_compact_is_atomic_and_lossless(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=8)
    before = t.snapshot().groupBy().agg(F.sum("v").alias("s")).collect()[0].s
    v = t.compact(target_files=1)
    assert len(t.files()) == 1
    after = t.snapshot().groupBy().agg(F.sum("v").alias("s")).collect()[0].s
    assert before == after
    # one commit: remove+add flipped together
    actions = json.load(open(_version_file(t.path, v)))
    assert sum(1 for a in actions if "add" in a) == 1
    assert sum(1 for a in actions if "remove" in a) == 8
    # time travel still sees the fragmented layout
    assert len(t.files(as_of=v - 1)) == 8


def test_schema_evolution_null_fills(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    gen2 = spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("x").alias("tag")
    )
    t.evolve_schema(gen2)
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "v", "tag"}
    rows = {r.k: r.tag for r in snap.collect()}
    assert rows[5] is None and rows[15] == "x"


def test_commit_conflict_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    # a second writer sneaks in version 1
    t2 = TxTable(spark, t.path, stat_cols=["k"])
    t2.append(spark.range(10, 12).select(F.col("id").alias("k"), F.lit(0).alias("v")))
    # first writer computed against version 0 and loses the race
    with pytest.raises(CommitConflictError):
        t._commit([{"add": {"path": "nope.parquet", "rows": 0, "stats": {}}}], 0)
    # retry on the fresh snapshot succeeds
    t.append(spark.range(12, 14).select(F.col("id").alias("k"), F.lit(0).alias("v")))
    assert t.version() == 2


def test_vacuum_removes_only_dead_files(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=8)
    t.compact(target_files=1)
    all_parquet = glob.glob(os.path.join(t.path, "data-*", "*.parquet"))
    assert len(all_parquet) == 9  # 8 dead + 1 live
    deleted = t.vacuum()
    assert deleted == 8
    assert t.snapshot().count() == 100  # live data intact


def test_crashed_writer_leaves_no_torn_table(spark, tmp_path):
    """Staged-but-uncommitted data files are invisible to readers."""
    t = _mk(spark, tmp_path, n=10, files=1)
    # simulate a crash: stage data, never commit
    t._stage(
        spark.range(100, 200).select(F.col("id").alias("k"), F.lit(0).alias("v")).coalesce(1)
    )
    assert t.snapshot().count() == 10
    assert t.vacuum() == 1  # the orphan is cleanable


def test_empty_update_batch_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    v0 = t.version()
    empty = spark.createDataFrame([], "k long, v long")
    assert t.merge_upsert(empty, "k") == v0
    assert t.snapshot().count() == 10


def test_string_key_stats_and_pruning(spark, tmp_path):
    """BYTE_ARRAY footer stats surface as bytes — the log stores them
    as JSON strings and MERGE pruning compares them as strings."""
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = (
        spark.range(260)
        .selectExpr("concat(chr(97 + CAST(id / 10 AS INT)), id % 10) AS k", "id AS v")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t.create(df)
    actions = json.load(open(_version_file(t.path, 0)))
    stats = [a["add"]["stats"]["k"] for a in actions if "add" in a]
    assert all(isinstance(s[0], str) for s in stats)
    hit, miss = t.pruned_files("k", "a0", "a9")
    assert len(hit) >= 1 and len(miss) >= 1
    ups = spark.createDataFrame([("a5", -1)], "k string, v long")
    t.merge_upsert(ups, "k")
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got["a5"] == -1 and len(got) == 260


def test_timestamp_stats_are_skipped_not_crashed(spark, tmp_path):
    """Stat types that don't serialize to JSON (timestamps) are
    dropped from the log instead of failing the commit."""
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["ts", "k"])
    df = spark.range(10).selectExpr("id AS k", "timestamp_millis(id * 1000) AS ts")
    t.create(df)
    actions = json.load(open(_version_file(t.path, 0)))
    stats = [a["add"]["stats"] for a in actions if "add" in a]
    assert all("k" in s for s in stats)  # numeric stats survive


def test_snapshot_preserves_catalyst_pushdown(spark, tmp_path):
    """The txlog read path is a plain multi-file parquet relation —
    filters and projections layered on a snapshot must reach the scan
    (PushedFilters / pruned ReadSchema), the same 100 TB contract
    test_plans.py pins for the fixture tables."""
    t = _mk(spark, tmp_path, n=1000, files=4)
    q = t.snapshot().filter(F.col("k") <= 10).select("k")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), LessThanOrEqual(k,10)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "k" in read_schema and "v" not in read_schema


def test_concurrent_appends_all_land_with_retry(spark, tmp_path):
    """Optimistic concurrency under real contention: 4 threads race
    appends with retry-on-conflict; every batch lands exactly once
    and the log is a gapless version chain."""
    import threading

    t = _mk(spark, tmp_path, n=10, files=1)
    errors = []

    def writer(base):
        try:
            df = spark.range(base, base + 10).select(
                F.col("id").alias("k"), F.lit(base).cast("long").alias("v")
            )
            w = TxTable(spark, t.path, stat_cols=["k"])
            for _ in range(20):  # retry loop
                try:
                    w.append(df)
                    return
                except CommitConflictError:
                    continue
            errors.append(f"writer {base}: starved")
        except Exception as e:  # noqa: BLE001
            errors.append(f"writer {base}: {e!r}")

    threads = [threading.Thread(target=writer, args=(100 * (i + 1),)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert t.version() == 4  # create + 4 appends, gapless
    snap = t.snapshot()
    assert snap.count() == 50
    # each batch's marker value appears exactly 10 times
    got = {r.v: r.n for r in snap.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    for base in (100, 200, 300, 400):
        assert got[base] == 10


def test_layout_aware_compaction_keeps_stats_selective(spark, tmp_path):
    """OPTIMIZE with a layout key range-clusters the rewrite so each
    output file covers a disjoint key range — pruning stays selective
    after compaction. A hash-fragmented table (every file spans the
    whole key domain) prunes nothing; after layout compaction a
    narrow key range isolates one file."""
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = spark.range(400).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.create(df.repartition(8))  # hash layout: all files span [0, 399]
    hit0, miss0 = t.pruned_files("k", 0, 40)
    assert len(miss0) == 0  # nothing prunable
    v = t.compact(target_files=4, layout_key="k")
    assert len(t.files()) == 4
    hit1, miss1 = t.pruned_files("k", 0, 40)
    assert len(hit1) == 1 and len(miss1) == 3
    assert t.snapshot().count() == 400
    assert {r.k for r in t.snapshot().collect()} == set(range(400))


def test_streaming_foreach_batch_sink_is_exactly_once(spark, tmp_path):
    """A real availableNow stream lands in the table through the
    foreachBatch sink; replaying a batch (the at-least-once hazard)
    is a no-op thanks to the txn marker — rows never duplicate."""
    src = tmp_path / "src"
    spark.range(40).selectExpr("id AS k", "id * 3 AS v").write.parquet(str(src))
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    t.create(spark.createDataFrame([], "k long, v long"))

    stream = spark.readStream.schema("k long, v long").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(t.foreach_batch_writer("job1"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert t.snapshot().count() == 40
    committed = t.committed_txns("job1")
    assert committed  # at least one batch landed with a marker

    # engine replays a batch after restart: same (app, batch) → no-op
    replay = spark.range(40).selectExpr("id AS k", "id * 3 AS v")
    assert t.append_batch(replay, "job1", next(iter(committed))) is None
    assert t.snapshot().count() == 40
    # a NEW batch id still appends
    assert t.append_batch(replay.limit(5), "job1", max(committed) + 1) is not None
    assert t.snapshot().count() == 45


def test_merge_with_new_column_evolves_on_read(spark, tmp_path):
    """An update batch carrying a column the table lacks merges
    cleanly: kept rows null-fill the new column (unionByName with
    allowMissingColumns), and the snapshot surfaces it via
    mergeSchema."""
    t = _mk(spark, tmp_path, n=20, files=1)
    ups = spark.createDataFrame([(5, -5, "new")], "k long, v long, tag string")
    t.merge_upsert(ups, "k")
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "v", "tag"}
    rows = {r.k: (r.v, r.tag) for r in snap.collect()}
    assert rows[5] == (-5, "new")
    assert rows[6] == (12, None)
    assert len(rows) == 20
