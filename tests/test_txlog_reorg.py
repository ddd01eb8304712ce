"""REORG TABLE ... APPLY (PURGE) (sources/txlog.py reorg_purge):
rewrite exactly the files still carrying soft-deleted state — a
deletion vector, or parquet columns a mapping DROP COLUMN removed
from the logical schema. The Delta REORG PURGE contract: after a
metadata-only DROP the bytes persist until this verb rewrites them
(then vacuum can destroy them); selection is footer/log METADATA
(O(scope) driver reads), never a data scan; clean files keep their
add actions untouched; nothing-to-do commits nothing."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.sources.txlog import TxTable


def _mk(spark, tmp_path, n=100, files=4, **kw):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"], **kw)
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.concat(F.lit("s"), F.col("id")).alias("secret"),
        )
        .repartition(files)
    )
    t.create(df)
    return t


def _footer_names(t):
    return {f: set(pq.read_schema(f).names) for f in t.files()}


def test_purge_rewrites_dropped_column_bytes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_column("secret")
    # metadata-only DROP: every original file still carries the bytes
    assert all("secret" in names for names in _footer_names(t).values())
    v = t.reorg_purge()
    assert v == t.version()
    # the bytes are gone from every LIVE file, content is unchanged
    assert all("secret" not in names for names in _footer_names(t).values())
    snap = t.snapshot()
    assert snap.columns == ["k", "v"]
    assert {(r.k, r.v) for r in snap.collect()} == {(i, 2 * i) for i in range(100)}


def test_purge_is_idempotent_and_noop_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    base = t.version()
    # clean table: no vectors, no residue — no commit at all
    assert t.reorg_purge() == base
    assert t.version() == base
    t.drop_column("secret")
    v1 = t.reorg_purge()
    assert v1 == t.version()
    # second tick finds nothing (footers are clean now)
    assert t.reorg_purge() == v1
    assert t.version() == v1


def test_purge_materializes_deletion_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path, deletion_vectors=True)
    t.delete_where("k >= 90")
    state = t._replay_state()
    assert any(a.get("dv") for a in state["adds"].values())
    t.reorg_purge()
    state = t._replay_state()
    assert not any(a.get("dv") for a in state["adds"].values())
    assert t.snapshot().count() == 90
    # the rewritten files physically lack the deleted rows
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in t.files())
    assert total == 90


def test_rename_alone_is_not_residue(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    base = t.version()
    # physical names are unchanged by a rename: nothing to purge
    assert t.reorg_purge() == base
    assert t.version() == base


def test_purge_selects_only_dirty_files(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=2)
    t.drop_column("secret")
    # files appended AFTER the drop are born clean
    t.append(
        spark.range(50, 60).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )
    clean_before = {
        f for f in t.files() if "secret" not in pq.read_schema(f).names
    }
    mtimes = {f: os.path.getmtime(f) for f in clean_before}
    t.reorg_purge()
    # clean files kept their add actions — same paths, untouched bytes
    live = set(t.files())
    assert clean_before <= live
    assert all(os.path.getmtime(f) == mtimes[f] for f in clean_before)
    assert t.snapshot().count() == 60


def test_purge_where_scopes_by_partition(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).alias("p"),
        F.concat(F.lit("s"), F.col("id")).alias("secret"),
    )
    t.create(df, partition_by=["p"])
    t.drop_column("secret")
    other = {f for f in t.files() if "p=1" in f}
    mtimes = {f: os.path.getmtime(f) for f in other}
    t.reorg_purge(where="p = 0")
    # out-of-scope partition untouched — residue still present there
    assert all(os.path.getmtime(f) == mtimes[f] for f in other)
    for f in t.files():
        names = set(pq.read_schema(f).names)
        if "p=1" in f:
            assert "secret" in names
        else:
            assert "secret" not in names
    # content unchanged either way
    assert t.snapshot().count() == 40
    # a second, unscoped pass finishes the job
    t.reorg_purge()
    assert all("secret" not in set(pq.read_schema(f).names) for f in t.files())


def test_purge_commits_no_change_feed_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, deletion_vectors=True)
    t.set_properties(changeDataFeed=True)
    t.delete_where("k >= 95")
    t.drop_column("secret")
    v = t.reorg_purge()
    # dataChange=False: the feed across the purge commit is empty
    assert t.changes(v, v).count() == 0


def test_purge_then_vacuum_destroys_the_bytes(spark, tmp_path):
    t = _mk(spark, tmp_path, n=30, files=1)
    t.drop_column("secret")
    old = set(t.files())
    t.reorg_purge()
    t.vacuum(retention_seconds=0.0)
    # the pre-purge files (the last copies of the dropped bytes) are
    # physically gone — the GDPR endgame DROP+REORG+VACUUM promises
    assert not any(os.path.exists(f) for f in old)
    assert t.snapshot().count() == 30
