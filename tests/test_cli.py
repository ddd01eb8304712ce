"""CLI smoke tests: each of the three reference-tool surfaces driven
end-to-end on tmp-path fixtures."""

from __future__ import annotations

import os

import pytest

from hz_csv2parquet_spark.cli import main


@pytest.fixture()
def geo_csv(tmp_path, spark):
    p = tmp_path / "points_a.csv"
    p.write_text(
        "Latitude,Longitude,Data,Extra\n"
        "10.0,20.0,100.0,x\n"
        "10.00001,20.00001,200.0,y\n"
        "-45.0,170.0,50.0,z\n"
    )
    q = tmp_path / "points_b.csv"
    q.write_text("Latitude,Longitude,Data,Extra\n10.0,20.0,300.0,w\n")
    return tmp_path


def test_cli_convert_file(geo_csv, spark):
    src = str(geo_csv / "points_a.csv")
    assert main(["convert", src]) == 0
    out = str(geo_csv / "points_a.parquet")
    assert os.path.exists(out)
    df = spark.read.parquet(out)
    assert df.count() == 3 and "Extra" in df.columns


def test_cli_log_file_dual_surface(geo_csv, spark):
    """--log-file mirrors the reference's dual console+file logging
    (csv2parquet.py:203-244): timestamped lines appended to the file,
    accumulated across runs."""
    src = str(geo_csv / "points_a.csv")
    log = str(geo_csv / "run.log")
    assert main(["--log-file", log, "convert", src]) == 0
    text = open(log).read()
    assert "start tool=convert" in text and "done tool=convert" in text
    assert main(["--log-file", log, "convert", src]) == 0  # append mode
    assert open(log).read().count("done tool=convert") == 2


def test_cli_convert_directory_per_file(geo_csv, spark):
    assert main(["convert", str(geo_csv), "--single-file"]) == 0
    dest = str(geo_csv).rstrip("/") + "_parquet"
    assert os.path.exists(os.path.join(dest, "points_a.parquet"))
    assert os.path.exists(os.path.join(dest, "points_b.parquet"))


def test_cli_agg_per_file_vs_collate(geo_csv, spark):
    pat = str(geo_csv / "points_*.csv")
    assert main(["agg", pat, "-m", "mean", "-s", "1000", "--per-file"]) == 0
    a = spark.read.parquet(str(geo_csv / "points_a_geo_aggregated.parquet"))
    assert a.columns == ["Data", "Latitude", "Longitude"]
    # rows 1+2 share a 1 km cell: mean of (100/10, 200/10) = 15;
    # the far point aggregates alone: 50/10 = 5
    assert sorted(r.Data for r in a.collect()) == pytest.approx([5.0, 15.0])

    assert main(["agg", pat, "_collated", "-m", "mean", "-s", "1000", "--collate"]) == 0
    c = spark.read.parquet(str(geo_csv / "points_a_collated.parquet"))
    # collate folds file b's 300 into the shared cell: mean(10,20,30) = 20
    assert sorted(r.Data for r in c.collect()) == pytest.approx([5.0, 20.0])


def test_cli_add_country_with_sentinel(geo_csv, tmp_path, spark):
    lk = tmp_path / "lookup.csv"
    lk.write_text("lat_bin,lon_bin,country\n10,20,Atlantis\n")
    assert (
        main(
            [
                "add-country",
                str(geo_csv / "points_a.csv"),
                "--lookup",
                str(lk),
                "--grid-deg",
                "1.0",
            ]
        )
        == 0
    )
    out = spark.read.option("header", True).csv(str(geo_csv / "points_a_with_country.csv"))
    got = {r.Data: r.Country for r in out.collect()}
    assert got["100.0"] == "Atlantis" and got["200.0"] == "Atlantis"
    assert got["50.0"] == "No country"  # no lookup cell → sentinel


def test_cli_no_match_errors(geo_csv):
    with pytest.raises(SystemExit):
        main(["agg", str(geo_csv / "nope_*.csv")])


def test_cli_curate_pipeline(tmp_path, spark):
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [
            (1, "a quick brown fox jumps over the lazy dog near some river bank"),
            (2, "a quick brown fox jumps over the lazy dog near some river bank"),
            (3, "spam spam spam spam spam spam"),
            (4, "a completely different document with plenty of unique words inside"),
        ],
        "doc_id bigint, text string",
    ).write.parquet(str(src))
    out = tmp_path / "curated"
    assert main(["curate", str(src), str(out), "--shards", "2"]) == 0
    res = spark.read.parquet(str(out))
    ids = sorted(r.doc_id for r in res.collect())
    # doc 2 (exact dup of 1, higher id) and doc 3 (repetition gate) dropped
    assert ids == [1, 4]
    assert "shard_id" in res.columns


def test_cli_curate_rate_zero_keeps_nothing(tmp_path, spark):
    src = tmp_path / "docs2.parquet"
    spark.createDataFrame(
        [(1, "one ordinary document with several distinct words here")],
        "doc_id bigint, text string",
    ).write.parquet(str(src))
    out = tmp_path / "curated2"
    assert main(["curate", str(src), str(out), "--rate", "0.0", "--no-quality"]) == 0
    # empty partitioned write: _SUCCESS marker, zero data files (an
    # empty hive dataset has no schema to infer — expected shape)
    assert (out / "_SUCCESS").exists()
    assert not list(out.rglob("*.parquet"))


def test_cli_table_lifecycle(tmp_path, spark):
    """The txlog maintenance verbs driven through the CLI: create →
    history → compact → vacuum → time-travel export."""
    src = tmp_path / "in"
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").repartition(4).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert os.path.isdir(os.path.join(tbl, "_txlog"))
    assert main(["table", "compact", tbl]) == 0
    # time travel works while the pre-compaction files still exist...
    out = str(tmp_path / "out")
    assert main(["table", "export", tbl, "--dest", out, "--as-of", "0"]) == 0
    assert spark.read.parquet(out).count() == 100
    # ...vacuum then reclaims them (Delta-style: breaks time travel
    # past the removes, never the current snapshot; the explicit
    # zero-retention opt-out is required because the default window
    # protects young files from racing in-flight writers)
    assert main(["table", "vacuum", tbl, "--retention-seconds", "0"]) == 0
    out2 = str(tmp_path / "out2")
    assert main(["table", "export", tbl, "--dest", out2]) == 0
    assert spark.read.parquet(out2).count() == 100
    assert main(["table", "history", tbl]) == 0


def test_cli_table_merge_rewrites_only_touched_files(tmp_path, spark):
    """`table merge` drives the txlog's stats-pruned MERGE: updates
    confined to one file's key range rewrite that file only, and the
    required options are validated up front."""
    src = tmp_path / "in"
    (
        spark.range(400)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.parquet(str(src))
    )
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0

    ups = tmp_path / "ups"
    spark.range(0, 41, 2).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v").coalesce(
        1
    ).write.parquet(str(ups))
    from hz_csv2parquet_spark.sources.txlog import TxTable

    t = TxTable(spark, tbl, stat_cols=["k"])
    before = set(t.files())
    assert main(["table", "merge", tbl, "--src", str(ups), "--key", "k", "--stat-cols", "k"]) == 0
    after = set(t.files())
    assert len(before & after) == len(before) - 1  # one file rewritten
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got[0] == -1 and got[40] == -1 and got[41] == 82 and len(got) == 400

    # verb validation: merge without --key refuses up front
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["table", "merge", tbl, "--src", str(ups)])


def test_cli_table_changes_feed(tmp_path, spark):
    """`table changes` exports the row-level CDF between versions:
    create (v0) → merge (v1) → the feed over (0, latest] holds the
    update's delete+insert and the new key's insert, nothing else."""
    src = tmp_path / "in"
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.parquet(str(src))
    ups = tmp_path / "ups"
    spark.createDataFrame([(3, -3), (100, -100)], "k long, v long").coalesce(
        1
    ).write.parquet(str(ups))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert main(["table", "merge", tbl, "--src", str(ups), "--key", "k", "--stat-cols", "k"]) == 0
    out = str(tmp_path / "feed")
    assert main(["table", "changes", tbl, "--from-version", "0", "--dest", out]) == 0
    feed = {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    assert feed == {(3, -3, "insert", 1), (100, -100, "insert", 1), (3, 6, "delete", 1)}
    # required-option validation
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["table", "changes", tbl])


def test_cli_table_delete_where(tmp_path, spark):
    """`table delete --where` drives the copy-on-write DELETE."""
    src = tmp_path / "in"
    spark.range(20).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert main(["table", "delete", tbl, "--where", "k >= 15"]) == 0
    from hz_csv2parquet_spark.sources.txlog import TxTable

    t = TxTable(spark, tbl, stat_cols=["k"])
    assert {r.k for r in t.snapshot().collect()} == set(range(15))
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["table", "delete", tbl])


def test_cli_table_describe_and_history_ops(tmp_path, spark, capsys):
    src = tmp_path / "in"
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").repartition(3).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert main(["table", "compact", tbl]) == 0
    assert main(["table", "describe", tbl]) == 0
    out = capsys.readouterr().out
    assert "version: 1" in out and "rows: 10" in out and "k bigint" in out
    assert main(["table", "history", tbl]) == 0
    out = capsys.readouterr().out
    assert "[CREATE]" in out and "[OPTIMIZE]" in out
    assert main(["table", "vacuum", tbl, "--retention-seconds", "0", "--dry-run"]) == 0


def test_cli_sql_over_fixtures_and_txlog_view(tmp_path, spark, capsys):
    """The sql verb: fixture tables and txlog snapshots register as
    temp views and an ANSI statement joins across both."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    src = tmp_path / "t.csv"
    src.write_text("k,v\n1,10\n2,20\n3,30\n")
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert (
        main(
            [
                "sql",
                "SELECT r_name, (SELECT SUM(v) FROM mytbl) AS total "
                "FROM region ORDER BY r_name LIMIT 2",
                "--sf-dir",
                sf_dir,
                "--table",
                f"mytbl={tbl}",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "60" in out and "AFRICA" in out
    # --dest writes instead of printing
    dest = str(tmp_path / "out.parquet")
    assert (
        main(["sql", "SELECT k, v FROM mytbl WHERE k > 1",
              "--table", f"mytbl={tbl}", "--dest", dest])
        == 0
    )
    assert spark.read.parquet(dest).count() == 2


def test_cli_sql_ctas_into_fresh_path_and_fallthrough(tmp_path, spark, capsys):
    """Round 13: a --table registration may name a path with NO table
    yet — that is how `sql "CREATE TABLE t AS SELECT"` targets it —
    and a Spark-capable verb against an UNREGISTERED name falls
    through to spark.sql instead of dying with the txlog error."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    tbl = str(tmp_path / "fresh")
    assert (
        main(
            [
                "sql",
                "CREATE TABLE newt AS SELECT r_regionkey AS k, r_name AS name "
                "FROM region",
                "--sf-dir",
                sf_dir,
                "--table",
                f"newt={tbl}",
            ]
        )
        == 0
    )
    from hz_csv2parquet_spark.sources.txlog import TxTable

    t = TxTable(spark, tbl)
    assert t.version() == 0 and t.snapshot().count() == 5
    # fall-through: CREATE against a name with NO --table registration
    # runs through spark.sql (a real temp view results)
    assert (
        main(
            [
                "sql",
                "CREATE OR REPLACE TEMPORARY VIEW some_view AS SELECT 1 AS x",
            ]
        )
        == 0
    )


def test_cli_table_set_properties_and_selective_compact(tmp_path, spark):
    """set-properties + compact --max-file-rows ride the CLI."""
    import json as j

    src = tmp_path / "t.csv"
    src.write_text("k,v\n" + "\n".join(f"{i},{10*i}" for i in range(20)) + "\n")
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert (
        main(["table", "set-properties", tbl, "--properties",
              "changeDataFeed=true,deletionVectors=true"])
        == 0
    )
    # a bare CLI delete now stages cdc + vectors via the log properties
    assert main(["table", "delete", tbl, "--where", "k = 3"]) == 0
    from hz_csv2parquet_spark.sources.txlog import TxTable

    t = TxTable(spark, tbl)
    state = t._replay_state()
    assert state["properties"]["deletionVectors"] is True
    assert any(a.get("dv") for a in state["adds"].values())
    assert t.changes(1).count() == 1
    assert main(["table", "compact", tbl, "--max-file-rows", "1000"]) == 0
    assert not any(a.get("dv") for a in t._replay_state()["adds"].values())
    assert t.snapshot().count() == 19


def test_cli_table_update(tmp_path, spark):
    """table update --where --set: the UPDATE DML verb end-to-end
    through the CLI (repeatable --set, expressions see the old row)."""
    from hz_csv2parquet_spark.cli import main

    src = tmp_path / "src"
    spark.range(10).selectExpr(
        "id AS k", "CAST(id * 2 AS BIGINT) AS v"
    ).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src)]) == 0
    assert (
        main(
            ["table", "update", tbl, "--where", "k >= 8", "--set", "v=v+100"]
        )
        == 0
    )
    from hz_csv2parquet_spark.sources.txlog import TxTable

    got = {r.k: r.v for r in TxTable(spark, tbl).snapshot().collect()}
    assert got[8] == 116 and got[9] == 118 and got[0] == 0
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["table", "update", tbl, "--where", "k = 1"])  # no --set


def test_cli_table_convert(tmp_path, spark):
    """table convert: in-place adoption of a plain parquet directory."""
    from hz_csv2parquet_spark.cli import main
    from hz_csv2parquet_spark.sources.txlog import TxTable

    tbl = str(tmp_path / "plain")
    spark.range(20).selectExpr("id AS k").write.parquet(tbl)
    assert main(["table", "convert", tbl]) == 0
    assert TxTable(spark, tbl).snapshot().count() == 20


def test_cli_table_rename_and_drop_column(tmp_path, spark, capsys):
    """table rename-column/drop-column: metadata-only DDL through the
    CLI, surfaced by describe."""
    from hz_csv2parquet_spark.cli import main
    from hz_csv2parquet_spark.sources.txlog import TxTable

    src = tmp_path / "src"
    spark.range(10).selectExpr(
        "id AS k", "CAST(id * 2 AS BIGINT) AS v", "CAST(id AS STRING) AS tag"
    ).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src)]) == 0
    assert (
        main(["table", "rename-column", tbl, "--column", "v", "--to", "value"])
        == 0
    )
    assert main(["table", "drop-column", tbl, "--column", "tag"]) == 0
    snap = TxTable(spark, tbl).snapshot()
    assert set(snap.columns) == {"k", "value"}
    assert snap.filter("value = 18").count() == 1
    assert main(["table", "describe", tbl]) == 0
    out = capsys.readouterr().out
    assert "column mapping: name mode, renamed v->value" in out
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["table", "rename-column", tbl, "--column", "k"])  # no --to


def test_cli_table_clone_and_generated(tmp_path, spark):
    """``table clone --dest`` (zero-copy reference) and ``table
    create --generated COL=EXPR`` (computed on create, enforced by
    the writer-feature gate) through the CLI surface."""
    import pytest as _pytest

    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    src = tmp_path / "in"
    spark.range(20).selectExpr("id AS k", "cast(id % 4 AS int) AS x").write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert (
        main(
            [
                "table", "create", tbl, "--src", str(src),
                "--generated", "bucket=abs(x - 2)",
                "--partition-by", "bucket",
            ]
        )
        == 0
    )
    snap = spark.read.format("hz_txlog").load(tbl)
    assert "bucket" in snap.columns
    assert snap.filter("bucket <> abs(x - 2)").count() == 0

    dest = str(tmp_path / "clone")
    assert main(["table", "clone", tbl, "--dest", dest]) == 0
    csnap = spark.read.format("hz_txlog").load(dest)
    assert csnap.count() == 20
    # the clone referenced, not copied: no data bytes under dest
    assert not [p for p in os.listdir(dest) if p.startswith("data-")]
    assert main(["table", "describe", tbl]) == 0

    with _pytest.raises(SystemExit):
        main(["table", "clone", tbl])  # no --dest
    with _pytest.raises(SystemExit):
        main(["table", "create", str(tmp_path / "t2"), "--src", str(src), "--generated", "badpair"])


def test_cli_table_reorg_purge_and_index_bloom(tmp_path, spark):
    """The GDPR upkeep verbs through the CLI: index-bloom builds the
    point-lookup skipper, drop-column is metadata-only, reorg-purge
    rewrites the residue so vacuum can destroy it."""
    import pyarrow.parquet as pq

    from hz_csv2parquet_spark.sources.txlog import TxTable

    src = tmp_path / "in"
    spark.range(40).selectExpr(
        "id AS k", "CAST(id AS STRING) AS pii"
    ).repartition(2).write.parquet(str(src))
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert main(["table", "index-bloom", tbl, "--column", "k,pii"]) == 0
    t = TxTable(spark, tbl, stat_cols=["k"])
    assert all(
        a.get("bloom") for a in t._replay_state()["adds"].values()
    )
    with pytest.raises(SystemExit):
        main(["table", "index-bloom", tbl])  # --column required
    assert main(["table", "drop-column", tbl, "--column", "pii"]) == 0
    assert main(["table", "reorg-purge", tbl]) == 0
    assert all(
        "pii" not in set(pq.read_schema(f).names) for f in t.files()
    )
    out = str(tmp_path / "out")
    assert main(["table", "export", tbl, "--dest", out]) == 0
    assert spark.read.parquet(out).count() == 40


def test_cli_table_set_and_drop_not_null(tmp_path, spark):
    """Round 13: the NOT NULL verbs ride the table CLI, metadata-first
    validation included (a table with NULL history refuses)."""
    src = tmp_path / "t.csv"
    src.write_text("k,v\n1,10\n2,20\n3,30\n")
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k,v"]) == 0
    assert main(["table", "set-not-null", tbl, "--column", "v"]) == 0
    from hz_csv2parquet_spark.sources.txlog import TxTable

    t = TxTable(spark, tbl)
    assert t.constraints() == {"nn_v": "v IS NOT NULL"}
    assert main(["table", "drop-not-null", tbl, "--column", "v"]) == 0
    assert TxTable(spark, tbl).constraints() == {}
