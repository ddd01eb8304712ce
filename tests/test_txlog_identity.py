"""GENERATED ALWAYS AS IDENTITY columns (sources/txlog.py): unique
engine-assigned ids on every append path, a log-serialized high-water
mark as the reservation record, ALWAYS semantics (writers may never
supply or SET the column), and the writer-feature gate for unaware
writers. Mirrors Delta's identity-column contract: uniqueness and
per-task monotonicity guaranteed, contiguity not (values gap)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.sources.txlog import (
    CommitConflictError,
    TableFeatureError,
    TxTable,
)


def _mk(spark, tmp_path, n=20, files=2, **kw):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"], **kw)
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(files)
    t.create(df, identity={"rid": {}})
    return t


def _rids(t):
    return [r.rid for r in t.snapshot().collect()]


def test_create_assigns_unique_ids_and_hwm(spark, tmp_path):
    t = _mk(spark, tmp_path)
    rids = _rids(t)
    assert len(rids) == 20 and len(set(rids)) == 20
    assert all(r >= 1 for r in rids)
    spec = t.identity_columns()["rid"]
    assert spec["start"] == 1 and spec["step"] == 1
    assert spec["highWaterMark"] == max(rids)
    # schema carries the column as bigint
    assert dict(t.snapshot().dtypes)["rid"] == "bigint"


def test_append_draws_above_the_high_water_mark(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = set(_rids(t))
    hwm0 = t.identity_columns()["rid"]["highWaterMark"]
    t.append(
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
        ).repartition(3)
    )
    after = _rids(t)
    assert len(after) == 30 and len(set(after)) == 30
    new = set(after) - before
    assert all(r > hwm0 for r in new)
    assert t.identity_columns()["rid"]["highWaterMark"] == max(after)


def test_start_and_step_respected(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(
        spark.range(5).select(F.col("id").alias("k")),
        identity={"rid": {"start": 1000, "step": 10}},
    )
    rids = sorted(_rids(t))
    assert rids[0] >= 1000
    assert all((r - 1000) % 10 == 0 for r in rids)
    # negative step counts down
    t2 = TxTable(spark, str(tmp_path / "tbl2"))
    t2.create(
        spark.range(5).select(F.col("id").alias("k")),
        identity={"rid": {"start": -1, "step": -1}},
    )
    rids2 = [r.rid for r in t2.snapshot().collect()]
    assert all(r <= -1 for r in rids2) and len(set(rids2)) == 5
    t2.append(spark.range(5, 8).select(F.col("id").alias("k")))
    rids3 = [r.rid for r in t2.snapshot().collect()]
    assert len(set(rids3)) == 8
    assert t2.identity_columns()["rid"]["highWaterMark"] == min(rids3)


def test_always_semantics_refuse_supplied_values(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    bad = spark.range(5).selectExpr("id as k", "id as v", "id as rid")
    with pytest.raises(ValueError, match="ALWAYS AS IDENTITY"):
        t.append(bad)
    with pytest.raises(ValueError, match="cannot SET identity"):
        t.update_where("k = 0", {"rid": "99"})
    with pytest.raises(ValueError, match="ALWAYS AS IDENTITY"):
        t.merge_upsert(bad, "k")
    with pytest.raises(ValueError, match="merge keys"):
        t.merge_upsert(spark.range(2).selectExpr("id as k", "id as v"), "rid")
    # declaration-time validation
    t3 = TxTable(spark, str(tmp_path / "t3"))
    with pytest.raises(ValueError, match="step must be non-zero"):
        t3.create(spark.range(2).selectExpr("id as k"),
                  identity={"rid": {"step": 0}})
    with pytest.raises(ValueError, match="partition column"):
        t3.create(spark.range(2).selectExpr("id as k"),
                  partition_by=["p"], identity={"p": {}})


def test_merge_matched_keys_keep_ids_new_keys_draw_fresh(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    ids_before = {r.k: r.rid for r in t.snapshot().collect()}
    hwm0 = t.identity_columns()["rid"]["highWaterMark"]
    t.merge_upsert(
        spark.range(8, 14).select(F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")),
        "k",
    )
    rows = {r.k: r for r in t.snapshot().collect()}
    assert len(rows) == 14
    # matched keys kept their identity values
    assert rows[8].rid == ids_before[8] and rows[9].rid == ids_before[9]
    assert rows[8].v == -1
    # new keys drew above the old hwm
    for k in (10, 11, 12, 13):
        assert rows[k].rid > hwm0
    all_ids = [r.rid for r in rows.values()]
    assert len(set(all_ids)) == 14
    assert t.identity_columns()["rid"]["highWaterMark"] == max(all_ids)


def test_streaming_append_batch_idempotent_with_identity(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4, files=1)
    batch = spark.range(100, 104).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )
    v1 = t.append_batch(batch, "job", 0)
    assert v1 is not None
    assert t.append_batch(batch, "job", 0) is None  # replayed: no-op
    rids = _rids(t)
    assert len(rids) == 8 and len(set(rids)) == 8


def test_evolve_schema_assigns_ids_too(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4, files=1)
    t.evolve_schema(
        spark.range(50, 53).select(
            F.col("id").alias("k"), F.lit(9).alias("extra")
        )
    )
    rows = t.snapshot().collect()
    rids = [r.rid for r in rows]
    assert len(rids) == 7 and len(set(rids)) == 7
    assert t.identity_columns()["rid"]["highWaterMark"] == max(rids)


def test_unaware_writer_feature_gate_and_sink_refusal(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4, files=1)
    state = t._replay_state()
    assert "identityColumns" in state["writerFeatures"]
    # the session-less DSv2 sink fails closed at writer construction
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    with pytest.raises(Exception, match="IDENTITY"):
        (
            spark.range(3)
            .selectExpr("id as k", "id as v")
            .write.format("hz_txlog")
            .mode("append")
            .save(t.path)
        )
    # reads through the DSv2 source still work (reader-side unaffected)
    assert spark.read.format("hz_txlog").load(t.path).count() == 4


def test_racing_identity_appends_never_collide(spark, tmp_path, monkeypatch):
    """A lost version race must RESTAGE above the fresh hwm, never
    rebase the same staged ids — simulate the interleaving by
    committing a competing identity append between the loser's replay
    and its commit."""
    t = _mk(spark, tmp_path, n=4, files=1)
    rival = TxTable(spark, t.path, stat_cols=["k"])
    real_commit = t._commit
    fired = {"done": False}

    def racing_commit(actions, expected_version, operation=None, info=None):
        if not fired["done"] and operation == "APPEND":
            fired["done"] = True
            rival.append(
                spark.range(200, 204).selectExpr("id as k", "cast(0 as bigint) as v")
            )
        return real_commit(actions, expected_version, operation=operation, info=info)

    monkeypatch.setattr(t, "_commit", racing_commit)
    t.append(spark.range(300, 304).selectExpr("id as k", "cast(1 as bigint) as v"))
    rids = _rids(t)
    assert len(rids) == 12 and len(set(rids)) == 12  # no collisions
    assert t.identity_columns()["rid"]["highWaterMark"] == max(rids)


def test_rename_and_drop_rekey_the_spec(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4, files=1)
    hwm = t.identity_columns()["rid"]["highWaterMark"]
    t.rename_column("rid", "row_id")
    spec = t.identity_columns()
    assert "rid" not in spec and spec["row_id"]["highWaterMark"] == hwm
    # assignment still flows through the mapping on append
    t.append(spark.range(10, 12).selectExpr("id as k", "cast(0 as bigint) as v"))
    vals = [r.row_id for r in t.snapshot().collect()]
    assert len(set(vals)) == 6
    t.drop_column("row_id")
    assert t.identity_columns() == {}
    t.append(spark.range(20, 22).selectExpr("id as k", "cast(0 as bigint) as v"))
    assert "row_id" not in t.snapshot().columns


def test_clone_carries_spec_and_hwm(spark, tmp_path):
    t = _mk(spark, tmp_path, n=6, files=1)
    hwm = t.identity_columns()["rid"]["highWaterMark"]
    cl = t.clone(str(tmp_path / "cl"))
    assert cl.identity_columns()["rid"]["highWaterMark"] == hwm
    cl.append(spark.range(50, 53).selectExpr("id as k", "cast(0 as bigint) as v"))
    rids = [r.rid for r in cl.snapshot().collect()]
    assert len(set(rids)) == 9 and max(rids) > hwm


def test_checkpoint_roundtrip_preserves_identity(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"), checkpoint_interval=2)
    t.create(spark.range(3).selectExpr("id as k"), identity={"rid": {}})
    for i in range(4):  # crosses checkpoint boundaries
        t.append(spark.range(10 * i, 10 * i + 2).selectExpr("id as k"))
    import glob

    assert glob.glob(os.path.join(t.path, "_txlog", "*.ckpt*"))
    fresh = TxTable(spark, t.path)
    spec = fresh.identity_columns()["rid"]
    rids = [r.rid for r in fresh.snapshot().collect()]
    assert len(set(rids)) == 11
    assert spec["highWaterMark"] == max(rids)


def test_restore_past_rename_rekeys_spec_and_keeps_hwm(spark, tmp_path):
    """RESTORE rolls the schema back past a rename: the identity spec
    must re-key with it, and the high-water mark must never regress —
    ids handed out after the target version may live downstream."""
    t = _mk(spark, tmp_path, n=4, files=1)  # v0: create (rid)
    t.rename_column("rid", "row_id")  # v1
    t.append(spark.range(10, 13).selectExpr("id as k", "cast(0 as bigint) as v"))
    hwm = t.identity_columns()["row_id"]["highWaterMark"]
    t.restore(0)
    spec = t.identity_columns()
    assert list(spec) == ["rid"]
    assert spec["rid"]["highWaterMark"] == hwm  # monotonic through restore
    t.append(spark.range(20, 22).selectExpr("id as k", "cast(0 as bigint) as v"))
    rids = _rids(t)
    assert len(rids) == 6 and len(set(rids)) == 6
    assert max(rids) > hwm  # fresh draws stayed above the kept mark


def test_restore_past_drop_reinstates_spec(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4, files=1)  # v0
    hwm0 = t.identity_columns()["rid"]["highWaterMark"]
    t.drop_column("rid")  # v1: spec retired
    assert t.identity_columns() == {}
    t.restore(0)  # column (and spec) return
    spec = t.identity_columns()
    assert spec["rid"]["highWaterMark"] == hwm0
    assert len(set(_rids(t))) == 4


def test_restore_past_drop_keeps_advanced_hwm_via_log_walk(spark, tmp_path):
    """Advisor r12: ids issued between the restore target and a later
    DROP COLUMN live in time travel (and possibly downstream), but
    their advanced high-water mark is in NEITHER endpoint state — the
    target predates them and the head retired the spec. Only the log
    walk between target and head can recover the mark; a regressed
    hwm would re-issue those ids."""
    t = _mk(spark, tmp_path, n=4, files=1)  # v0
    # v1: append advances the hwm beyond the restore target's mark
    t.append(
        spark.range(10, 16).selectExpr("id as k", "cast(0 as bigint) as v")
    )
    hwm1 = t.identity_columns()["rid"]["highWaterMark"]
    ids_v1 = set(_rids(t))
    t.drop_column("rid")  # v2: spec (and advanced hwm) leave the head
    t.restore(0)  # spec returns; files roll back to the 4 v0 rows
    spec = t.identity_columns()
    assert spec["rid"]["highWaterMark"] >= hwm1
    t.append(
        spark.range(30, 33).selectExpr("id as k", "cast(0 as bigint) as v")
    )
    fresh = {r.rid for r in t.snapshot().where("k >= 30").collect()}
    assert fresh.isdisjoint(ids_v1)  # nothing re-issued
    assert all(r > hwm1 for r in fresh)


def test_dml_rebase_survives_interleaved_identity_append(spark, tmp_path, monkeypatch):
    """DELETE assigns no ids, so a moved hwm must NOT kill its
    blind-append rebase (round-12 review: the identity check belongs
    to the MERGE path only)."""
    t = _mk(spark, tmp_path, n=10, files=1)
    rival = TxTable(spark, t.path, stat_cols=["k"])
    real_commit = t._commit
    fired = {"done": False}

    def racing_commit(actions, expected_version, operation=None, info=None):
        if not fired["done"] and operation == "DELETE":
            fired["done"] = True
            # interleave an identity append: hwm moves, key range
            # disjoint from the delete predicate's touched file? the
            # DML extension scan handles matching rows either way
            rival.append(
                spark.range(500, 503).selectExpr(
                    "id as k", "cast(0 as bigint) as v"
                )
            )
        return real_commit(actions, expected_version, operation=operation, info=info)

    monkeypatch.setattr(t, "_commit", racing_commit)
    t.delete_where("k < 3")  # must NOT raise CommitConflictError
    rows = t.snapshot().collect()
    ks = sorted(r.k for r in rows)
    assert ks == [3, 4, 5, 6, 7, 8, 9, 500, 501, 502]
    rids = [r.rid for r in rows]
    assert len(set(rids)) == len(rids)


def test_resolver_multi_row_per_key_refused_on_identity(spark, tmp_path):
    t = _mk(spark, tmp_path, n=6, files=1)

    def keep_both(matched, updates):
        return matched.unionByName(updates, allowMissingColumns=True)

    upd = spark.range(4, 8).selectExpr("id as k", "cast(-1 as bigint) as v")
    with pytest.raises(ValueError, match="at most one row per matched key"):
        t.merge_upsert(upd, "k", resolve=keep_both)


def test_cdf_identity_merge_feed_ids_match_table_ids(spark, tmp_path):
    """The fresh-id expression is nondeterministic; the cdc diff
    must see the SAME draw the staging write committed (round-12
    review: the frame is pinned via localCheckpoint)."""
    t = TxTable(
        spark, str(tmp_path / "tbl"), stat_cols=["k"], change_data=True
    )
    t.create(
        spark.range(6)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(2),
        identity={"rid": {}},
    )
    v0 = t.version()
    t.merge_upsert(
        spark.range(4, 12).selectExpr("id as k", "cast(-1 as bigint) as v"),
        "k",
    )
    table_ids = {r.k: r.rid for r in t.snapshot().collect()}
    feed = t.changes(v0)
    for r in feed.where("_change_type = 'insert'").collect():
        assert r.rid == table_ids[r.k], "cdc id diverged from table id"


def test_dsv2_stream_tails_identity_appends(spark, tmp_path):
    """The hz_txlog stream reader tails an identity table: the
    hwm-advancing meta riding each append commit must not confuse
    version-offset planning, and streamed rows carry the assigned
    ids."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = _mk(spark, tmp_path, n=4, files=1)
    t.append(spark.range(10, 13).selectExpr("id as k", "cast(0 as bigint) as v"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    (
        spark.readStream.format("hz_txlog")
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = spark.read.parquet(out)
    rids = [r.rid for r in got.collect()]
    assert len(rids) == 7 and len(set(rids)) == 7
    assert set(rids) == {r.rid for r in t.snapshot().collect()}


def test_identity_on_partitioned_table(spark, tmp_path):
    """Identity + hive partitioning: ids assign before the
    partitioned staging write; hwm derives from per-file footer
    stats under the hive layout."""
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    t.create(
        spark.range(20).selectExpr("id as k", "id % 3 as p"),
        partition_by=["p"],
        identity={"rid": {}},
    )
    assert t.partition_columns() == ["p"]
    assert len(set(_rids(t))) == 20
    t.append(spark.range(20, 30).selectExpr("id as k", "id % 3 as p"))
    rows = t.snapshot().collect()
    assert len({r.rid for r in rows}) == 30
    assert t.identity_columns()["rid"]["highWaterMark"] == max(
        r.rid for r in rows
    )
    # partition pruning still serves the identity column
    sub = t.snapshot().where("p = 1")
    assert {r.rid for r in sub.collect()} <= {r.rid for r in rows}


def test_threaded_identity_writers_stay_unique(spark, tmp_path):
    """Four genuinely concurrent identity appends (each through its
    own TxTable handle): every lost race restages above the fresh
    hwm, so all ids stay unique and the hwm lands on the max."""
    import threading

    t = _mk(spark, tmp_path, n=4, files=1)
    errors = []

    def writer(base):
        try:
            TxTable(spark, t.path, stat_cols=["k"]).append(
                spark.range(base, base + 5).select(
                    F.col("id").alias("k"),
                    F.lit(base).cast("long").alias("v"),
                )
            )
        except Exception as e:  # noqa: BLE001
            errors.append(f"writer {base}: {e!r}")

    threads = [
        threading.Thread(target=writer, args=(100 * (i + 1),))
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    rids = _rids(t)
    assert len(rids) == 24 and len(set(rids)) == 24
    assert t.identity_columns()["rid"]["highWaterMark"] == max(rids)
