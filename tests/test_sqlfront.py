"""SQL front door (sqlfront.py): Delta's table-verb SQL surface —
UPDATE/DELETE/MERGE/OPTIMIZE/VACUUM/DESCRIBE HISTORY/RESTORE/ALTER
TABLE — parsed up front and routed to the TxTable verbs, since
Catalyst cannot execute DML against a Python data source. Grammar
deviations raise a named error stating the supported form; anything
that is not a table verb falls through to spark.sql."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark import sqlfront
from hz_csv2parquet_spark.sqlfront import SqlFrontDoorError
from hz_csv2parquet_spark.sources.txlog import TxTable


def _mk(spark, tmp_path, n=100, files=4, **kw):
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"], **kw)
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(files)
    t.create(df)
    return t


def _run(spark, stmt, tbl):
    return sqlfront.execute(spark, stmt, lambda name: {"t": tbl}[name])


def test_select_is_not_routed(spark, tmp_path):
    assert not sqlfront.routes("SELECT 1")
    assert sqlfront.execute(spark, "SELECT 1", lambda n: None) is None
    # WITH/INSERT etc. also pass through
    assert sqlfront.execute(spark, "WITH x AS (SELECT 1) SELECT * FROM x",
                            lambda n: None) is None


def test_update_set_where(spark, tmp_path):
    t = _mk(spark, tmp_path)
    out = _run(spark, "UPDATE t SET v = v + 1000 WHERE k < 10;", t).collect()
    assert out[0].operation == "UPDATE" and out[0].version == 1
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got[5] == 1010 and got[50] == 100


def test_update_multi_assignment_and_case_expr(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    # an expression containing '=' and a quoted comma must not break
    # the top-level splitter
    _run(
        spark,
        "UPDATE t SET v = CASE WHEN k = 0 THEN -1 ELSE v END, "
        "k = k + 100 WHERE k <= 1",
        t,
    )
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got[100] == -1 and got[101] == 2 and 0 not in got


def test_delete_from_where(spark, tmp_path):
    t = _mk(spark, tmp_path)
    out = _run(spark, "DELETE FROM t WHERE k >= 90", t).collect()
    assert out[0].operation == "DELETE"
    assert t.snapshot().count() == 90


def test_merge_upsert_canonical_form(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    src = spark.range(8, 12).select(
        F.col("id").alias("k"), F.lit(-5).alias("v")
    )
    src.createOrReplaceTempView("updates_v")
    out = _run(
        spark,
        "MERGE INTO t USING updates_v AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        t,
    ).collect()
    assert out[0].operation == "MERGE"
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert len(got) == 12 and got[8] == -5 and got[11] == -5 and got[0] == 0


def test_merge_subquery_source_and_alias(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    out = _run(
        spark,
        "MERGE INTO t AS tgt USING "
        "(SELECT CAST(9 AS BIGINT) AS k, CAST(9 AS BIGINT) AS v) AS s "
        "ON tgt.k = s.k "
        "WHEN NOT MATCHED THEN INSERT * WHEN MATCHED THEN UPDATE SET *",
        t,
    ).collect()
    assert out[0].operation == "MERGE"
    assert t.snapshot().where("k = 9").collect()[0].v == 9


def test_merge_rejects_non_upsert_forms(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    with pytest.raises(SqlFrontDoorError, match="supported: MERGE"):
        _run(
            spark,
            "MERGE INTO t USING u AS s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE",
            t,
        )
    with pytest.raises(SqlFrontDoorError, match="share a name"):
        _run(
            spark,
            "MERGE INTO t USING u AS s ON t.k = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            t,
        )


def test_optimize_and_zorder(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=8)
    out = _run(spark, "OPTIMIZE t", t).collect()
    assert out[0].operation == "OPTIMIZE"
    assert len(t.files()) == 1
    assert t.snapshot().count() == 100
    _run(spark, "OPTIMIZE t ZORDER BY (k, v)", t)
    assert t.snapshot().count() == 100


def test_vacuum_retain_and_dry_run(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, files=2)
    t.compact()  # orphan the two original files
    # sub-floor retention without FORCE is refused BEFORE any table
    # work — zero retention can delete a concurrent writer's staged-
    # but-uncommitted files and destroys time travel (advisor r12);
    # DRY RUN is not exempt (same preview, same hazard)
    with pytest.raises(SqlFrontDoorError, match="retention floor"):
        _run(spark, "VACUUM t RETAIN 0 HOURS", t)
    with pytest.raises(SqlFrontDoorError, match="retention floor"):
        _run(spark, "VACUUM t RETAIN 0 HOURS DRY RUN", t)
    assert len(t.files()) == 1 and t.snapshot().count() == 20
    dry = _run(spark, "VACUUM t RETAIN 0 HOURS DRY RUN FORCE", t).collect()
    assert dry[0].files_deletable == 2
    assert len(t.files()) == 1 and t.snapshot().count() == 20
    gone = _run(spark, "VACUUM t RETAIN 0 HOURS FORCE", t).collect()
    assert gone[0].files_deleted == 2
    # at-or-above-floor retention needs no FORCE (7-day default floor)
    ok = _run(spark, "VACUUM t RETAIN 200 HOURS", t).collect()
    assert ok[0].files_deleted == 0


def test_update_duplicate_set_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    with pytest.raises(SqlFrontDoorError, match="assigned more than once"):
        _run(spark, "UPDATE t SET v = 1, v = 2", t)
    # case-insensitive: V and v are the same column
    with pytest.raises(SqlFrontDoorError, match="assigned more than once"):
        _run(spark, "UPDATE t SET v = 1, V = 2", t)


def test_describe_history_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, files=1)
    t.delete_where("k < 5")
    hist = _run(spark, "DESCRIBE HISTORY t LIMIT 2", t)
    ops = [r.operation for r in hist.collect()]
    assert ops[0] == "DELETE" and len(ops) == 2
    out = _run(spark, "RESTORE TABLE t TO VERSION AS OF 0", t).collect()
    assert out[0].operation == "RESTORE"
    assert t.snapshot().count() == 20


def test_alter_table_forms(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    _run(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)", t)
    with pytest.raises(Exception, match="pos"):
        t.append(spark.sql("SELECT CAST(900 AS BIGINT) k, CAST(-1 AS BIGINT) v"))
    _run(spark, "ALTER TABLE t DROP CONSTRAINT pos", t)
    _run(spark, "ALTER TABLE t RENAME COLUMN v TO val", t)
    assert "val" in t.snapshot().columns
    _run(spark, "ALTER TABLE t SET TBLPROPERTIES ('changeDataFeed'='true')", t)
    v = t.version()
    t.delete_where("k = 0")
    assert t.changes(v).where("_change_type = 'delete'").count() == 1
    _run(spark, "ALTER TABLE t DROP COLUMN val", t)
    assert t.snapshot().columns == ["k"]


def test_non_txlog_targets_fall_through_for_spark_capable_verbs(spark):
    """Advisor r12: INSERT / ALTER TABLE against a table Spark's own
    catalog could serve must NOT die with 'not a registered
    transaction-log table' — execute() returns None so the caller's
    spark.sql path runs the statement. Lakehouse-only verbs keep the
    named error (Catalyst cannot run them anywhere)."""

    def resolver(name):
        raise KeyError(name)

    # Spark-capable verbs: fall through (None = caller uses spark.sql)
    assert sqlfront.execute(spark, "INSERT INTO cat_tbl VALUES (1)", resolver) is None
    assert (
        sqlfront.execute(spark, "INSERT OVERWRITE cat_tbl SELECT 1", resolver)
        is None
    )
    # even a form OUR grammar refuses, when the target is foreign
    assert (
        sqlfront.execute(spark, "ALTER TABLE cat_tbl ADD COLUMN x INT", resolver)
        is None
    )
    # lakehouse-only verbs: the named error stands
    for stmt in (
        "UPDATE cat_tbl SET v = 1",
        "DELETE FROM cat_tbl",
        "OPTIMIZE cat_tbl",
        "VACUUM cat_tbl",
        "RESTORE TABLE cat_tbl TO VERSION AS OF 0",
    ):
        with pytest.raises(SqlFrontDoorError, match="not a registered"):
            sqlfront.execute(spark, stmt, resolver)


def test_grammar_deviations_raise_named_errors(spark):
    dummy = lambda n: None
    cases = [
        "UPDATE t SETT v = 1",
        "UPDATE t SET WHERE k = 1",
        "DELETE t WHERE k = 1",
        "OPTIMIZE t ZORDER BY ()",
        "VACUUM t RETAIN x HOURS",
        "RESTORE t TO VERSION 3",
        "ALTER TABLE t ADD COLUMN x INT",
    ]
    for stmt in cases:
        with pytest.raises(SqlFrontDoorError):
            sqlfront.execute(spark, stmt, dummy)


def test_unknown_table_names_the_registry_gap(spark):
    def resolve(name):
        raise KeyError(name)

    with pytest.raises(SqlFrontDoorError, match="not a registered"):
        sqlfront.execute(spark, "DELETE FROM nosuch WHERE 1=1", resolve)


def test_cli_sql_dml_roundtrip(tmp_path, spark, capsys):
    """The sql CLI verb routes DML to the table and prints the
    summary row."""
    from hz_csv2parquet_spark.cli import main

    src = tmp_path / "t.csv"
    src.write_text("k,v\n1,10\n2,20\n3,30\n")
    tbl = str(tmp_path / "tbl")
    assert main(["table", "create", tbl, "--src", str(src), "--stat-cols", "k"]) == 0
    assert (
        main(["sql", "UPDATE mytbl SET v = v * 10 WHERE k = 2",
              "--table", f"mytbl={tbl}"])
        == 0
    )
    out = capsys.readouterr().out
    assert "UPDATE" in out
    assert (
        main(["sql", "SELECT v FROM mytbl WHERE k = 2",
              "--table", f"mytbl={tbl}"])
        == 0
    )
    assert "200" in capsys.readouterr().out
    # a grammar deviation surfaces as a clean exit, not a stack trace
    with pytest.raises(SystemExit):
        main(["sql", "UPDATE mytbl SETT v = 1", "--table", f"mytbl={tbl}"])


def test_fsck_repair_table_statement(spark, tmp_path):
    import os as _os

    t = _mk(spark, tmp_path, n=20, files=2)
    _os.remove(sorted(t.files())[0])
    dry = _run(spark, "FSCK REPAIR TABLE t DRY RUN", t).collect()
    assert len(dry) == 1 and t.version() == 0
    fixed = _run(spark, "FSCK REPAIR TABLE t", t).collect()
    assert [r.removed_file for r in fixed] == [r.removed_file for r in dry]
    assert t.snapshot().count() == 10
    with pytest.raises(SqlFrontDoorError, match="supported: FSCK"):
        _run(spark, "FSCK TABLE t", t)


def test_optimize_zorder_single_column_routes_to_layout_key(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=4)
    out = _run(spark, "OPTIMIZE t ZORDER BY (k)", t).collect()
    assert out[0].operation == "OPTIMIZE"
    assert len(t.files()) == 1 and t.snapshot().count() == 50


def test_insert_into_values_and_select(spark, tmp_path):
    t = _mk(spark, tmp_path, n=3, files=1)
    out = _run(spark, "INSERT INTO t VALUES (100, 1), (101, 2)", t).collect()
    assert out[0].operation == "INSERT"
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got[100] == 1 and got[101] == 2 and len(got) == 5
    # SELECT body; positional alignment casts to the table's types
    _run(spark, "INSERT INTO t SELECT 200, 5", t)
    assert t.snapshot().where("k = 200").collect()[0].v == 5
    with pytest.raises(SqlFrontDoorError, match="column"):
        _run(spark, "INSERT INTO t VALUES (1)", t)


def test_insert_overwrite_is_atomic_and_time_travelable(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=2)
    v_before = t.version()
    out = _run(
        spark, "INSERT OVERWRITE t VALUES (900, 1), (901, 2)", t
    ).collect()
    assert out[0].operation == "INSERT OVERWRITE"
    # ONE commit replaced the generation...
    assert t.version() == v_before + 1
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == {900: 1, 901: 2}
    # ...and the superseded generation stays time-travelable
    assert t.snapshot(as_of=v_before).count() == 5
    # positional cast alignment matches INSERT INTO (strings -> longs)
    _run(spark, "INSERT OVERWRITE t SELECT '7', '8'", t)
    assert {(r.k, r.v) for r in t.snapshot().collect()} == {(7, 8)}
    # a column list makes no sense for whole-row replacement
    with pytest.raises(SqlFrontDoorError, match="no column list"):
        _run(spark, "INSERT OVERWRITE t (k) SELECT 1", t)


def test_insert_into_identity_table_assigns_ids(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "ident"), stat_cols=["k"])
    t.create(
        spark.range(3).selectExpr("id as k", "id * 2 as v"),
        identity={"rid": {}},
    )
    _run(spark, "INSERT INTO t VALUES (50, 1), (51, 2)", t)
    rows = t.snapshot().collect()
    rids = [r.rid for r in rows]
    assert len(rows) == 5 and len(set(rids)) == 5


def test_tokenizer_respects_quotes_and_backticks(spark, tmp_path):
    """Keywords inside string literals must not split clauses, and
    backtick-quoted identifiers resolve like bare ones."""
    t = _mk(spark, tmp_path, n=5, files=1)
    # add a string column via evolve so a string literal can carry
    # the words WHERE / AND / SET
    t.evolve_schema(
        spark.sql("SELECT CAST(99 AS BIGINT) k, CAST(0 AS BIGINT) v, "
                  "'x' AS tag")
    )
    _run(
        spark,
        "UPDATE `t` SET tag = 'set where and, comma' WHERE `k` = 99",
        t,
    )
    got = t.snapshot().where("k = 99").collect()[0]
    assert got.tag == "set where and, comma"
    # a quoted comma inside SET must not split the assignment list
    _run(spark, "UPDATE t SET tag = 'a,b', v = 7 WHERE k = 99", t)
    got = t.snapshot().where("k = 99").collect()[0]
    assert got.tag == "a,b" and got.v == 7
    # DELETE with a subquery-free predicate containing quoted keyword
    _run(spark, "DELETE FROM t WHERE tag = 'a,b' AND k = 99", t)
    assert t.snapshot().where("k = 99").count() == 0


def test_insert_with_explicit_column_list(spark, tmp_path):
    t = _mk(spark, tmp_path, n=3, files=1)
    # reversed column order aligns by name, not position
    _run(spark, "INSERT INTO t (v, k) VALUES (5, 300)", t)
    assert t.snapshot().where("k = 300").collect()[0].v == 5
    with pytest.raises(SqlFrontDoorError, match="unknown column"):
        _run(spark, "INSERT INTO t (nope) VALUES (1)", t)
    with pytest.raises(SqlFrontDoorError, match="duplicate column"):
        _run(spark, "INSERT INTO t (k, k) VALUES (1, 2)", t)
    # generated column omitted via the list: computed by the append
    g = TxTable(spark, str(tmp_path / "gen"))
    g.create(
        spark.range(2).selectExpr("id as k"), generated={"dbl": "k * 2"}
    )
    sqlfront.execute(spark, "INSERT INTO g (k) VALUES (10)",
                     lambda name: {"g": g}[name])
    rows = {r.k: r.dbl for r in g.snapshot().collect()}
    assert rows[10] == 20


def test_create_table_as_select(spark, tmp_path):
    """CTAS into a registered path; IF NOT EXISTS no-ops on an
    existing table; OR REPLACE swaps the generation atomically and
    keeps the old one time-travelable."""
    t = TxTable(spark, str(tmp_path / "ctas"), stat_cols=["k"])
    out = _run(
        spark, "CREATE TABLE t AS SELECT id AS k, id * 2 AS v FROM range(5)", t
    ).collect()
    assert out[0].operation == "CREATE TABLE" and out[0].version == 0
    assert t.snapshot().count() == 5
    # plain CREATE on an existing table is refused by name
    with pytest.raises(SqlFrontDoorError, match="already exists"):
        _run(spark, "CREATE TABLE t AS SELECT 1 AS k", t)
    # IF NOT EXISTS: clean no-op
    out = _run(
        spark, "CREATE TABLE IF NOT EXISTS t AS SELECT 1 AS k", t
    ).collect()
    assert out[0].operation == "CREATE TABLE (exists)"
    assert t.snapshot().count() == 5
    # OR REPLACE: one atomic commit, old generation still readable
    v_before = t.version()
    _run(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT id AS k FROM range(3)",
        t,
    )
    assert t.snapshot().count() == 3 and t.snapshot().columns == ["k"]
    assert t.snapshot(as_of=v_before).count() == 5
    # exclusive modifiers are a named grammar error
    with pytest.raises(SqlFrontDoorError, match="exclusive"):
        _run(spark, "CREATE OR REPLACE TABLE IF NOT EXISTS t AS SELECT 1", t)
    # column-list CREATE on a REGISTERED, EXISTING table is refused
    # by name (round 15: the column-list form itself is supported —
    # see test_create_table_column_list — but never as replacement)
    with pytest.raises(SqlFrontDoorError, match="already exists"):
        _run(spark, "CREATE TABLE t (k BIGINT)", t)
    with pytest.raises(SqlFrontDoorError, match="schema from a query"):
        _run(spark, "CREATE OR REPLACE TABLE t (k BIGINT)", t)


def test_create_table_foreign_target_falls_through(spark):
    def resolver(name):
        raise KeyError(name)

    # CTAS against an unregistered name: Catalyst's statement, not ours
    assert (
        sqlfront.execute(
            spark, "CREATE TABLE cat_t AS SELECT 1 AS x", resolver
        )
        is None
    )
    # ...including shapes our grammar refuses (column-list CREATE)
    assert (
        sqlfront.execute(spark, "CREATE TABLE cat_t (k INT)", resolver) is None
    )


def test_alter_column_set_drop_not_null(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=2)
    out = _run(spark, "ALTER TABLE t ALTER COLUMN v SET NOT NULL", t).collect()
    assert out[0].operation == "SET NOT NULL"
    with pytest.raises(ValueError, match="nn_v"):
        t.append(spark.sql("SELECT CAST(1 AS BIGINT) k, CAST(NULL AS BIGINT) v"))
    out = _run(spark, "ALTER TABLE t ALTER COLUMN v DROP NOT NULL", t).collect()
    assert out[0].operation == "DROP NOT NULL"
    # verb-level refusals surface as ValueError (cmd_sql catches both)
    with pytest.raises(ValueError, match="no NOT NULL"):
        _run(spark, "ALTER TABLE t ALTER COLUMN v DROP NOT NULL", t)


def test_select_version_as_of_routes_to_asof_read(spark, tmp_path):
    """Delta's SQL time travel (round 14): VERSION AS OF rewrites to
    the DSv2 asOf read; the historical file set comes from log
    replay, not the current snapshot."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    t = _mk(spark, tmp_path, n=10, files=1)
    t.append(spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    register_txlog_source(spark)
    stmt = "SELECT COUNT(*) AS n, SUM(v) AS sv FROM t VERSION AS OF 0"
    assert sqlfront.routes(stmt)
    r0 = _run(spark, stmt, t).collect()[0]
    assert (r0.n, r0.sv) == (10, sum(2 * k for k in range(10)))
    # the latest read still sees both generations
    r1 = _run(spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 1", t).collect()[0]
    assert r1.n == 20
    # alias after the clause, Delta-style
    ra = _run(
        spark,
        "SELECT x.k FROM t VERSION AS OF 0 AS x WHERE x.k = 3",
        t,
    ).collect()
    assert [r.k for r in ra] == [3]


def test_select_timestamp_as_of_resolves_commit(spark, tmp_path):
    """TIMESTAMP AS OF picks the latest commit at or before the
    timestamp (batch semantics, via the checkpoint timestamp index)."""
    import json as _json
    import os as _os

    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    t = _mk(spark, tmp_path, n=10, files=1)
    t.append(spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    register_txlog_source(spark)
    cts = t.commit_timestamps()
    # epoch-seconds literal just after v0, before v1 would need a
    # wall-clock gap — use v0's own stamp (at-or-before resolution)
    r = _run(
        spark,
        f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {cts[0]}",
        t,
    ).collect()[0]
    assert r.n == 10
    # a quoted post-head timestamp resolves to the latest version
    r2 = _run(
        spark,
        f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {cts[1] + 1}",
        t,
    ).collect()[0]
    assert r2.n == 20


def test_select_time_travel_on_unregistered_table_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    with pytest.raises(SqlFrontDoorError, match="transaction-log table"):
        _run(spark, "SELECT * FROM unknown_tbl VERSION AS OF 0", t)


def test_select_without_as_of_still_falls_through(spark, tmp_path):
    assert not sqlfront.routes("SELECT * FROM t WHERE note = 'VERSION'")
    assert (
        sqlfront.execute(spark, "SELECT 1 AS one", lambda n: None) is None
    )


def test_time_travel_grammar_ignores_string_literals(spark, tmp_path):
    """A VERSION/TIMESTAMP AS OF phrase INSIDE a string literal must
    not trigger the rewrite (the clause search runs on a
    literal-masked copy); a real clause alongside a literal still
    rewrites, and the literal — including one containing quotes —
    passes through byte-identical."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    t = _mk(spark, tmp_path, n=4, files=1)
    register_txlog_source(spark)
    phantom = "SELECT 'FROM t VERSION AS OF 1' AS note"
    assert not sqlfront.routes(phantom)
    assert sqlfront.execute(spark, phantom, lambda n: None) is None
    mixed = (
        "SELECT COUNT(*) AS n, 'x VERSION AS OF 9 y' AS tag "
        "FROM t VERSION AS OF 0 WHERE 'it''s' = 'it''s'"
    )
    r = _run(spark, mixed, t).collect()[0]
    assert (r.n, r.tag) == (4, "x VERSION AS OF 9 y")


def test_time_travel_double_quoted_strings_and_odd_names(spark, tmp_path):
    """Spark's default parser reads double-quoted text as a string
    literal — a phantom clause inside one must not route; a
    backtick-quoted table name with a dash still rewrites to a valid
    view name."""
    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    phantom = 'SELECT "x FROM t VERSION AS OF 2" AS note'
    assert not sqlfront.routes(phantom)
    assert sqlfront.execute(spark, phantom, lambda n: None) is None

    t = TxTable(spark, str(tmp_path / "dash"), stat_cols=["k"])
    t.create(spark.range(3).select(F.col("id").alias("k")))
    register_txlog_source(spark)
    r = sqlfront.execute(
        spark,
        "SELECT COUNT(*) AS n FROM `odd-name` VERSION AS OF 0",
        lambda name: {"odd-name": t}[name],
    ).collect()[0]
    assert r.n == 3


def test_describe_detail(spark, tmp_path):
    """DESCRIBE DETAIL — Delta's one-row table-metadata surface:
    log-derived file/row/size counts, partition columns, properties,
    constraints, and writer features; O(files) driver metadata, no
    scan tasks."""
    import json as _json

    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["k"])
    df = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    t.create(df.repartition(2), partition_by=["p"])
    t.add_constraint("k_nonneg", "k >= 0")
    r = _run(spark, "DESCRIBE DETAIL t", t).collect()[0]
    assert r.format == "hz_txlog" and r.location == t.path
    assert r.version == t.version() and r.numRows == 20
    assert r.numFiles == len(t.files()) and r.sizeInBytes > 0
    assert list(r.partitionColumns) == ["p"]
    assert _json.loads(r.constraints) == {"k_nonneg": "k >= 0"}
    assert r.lastModified is not None
    with pytest.raises(SqlFrontDoorError, match="DESCRIBE DETAIL"):
        _run(spark, "DESCRIBE DETAIL t LIMIT 3", t)


def test_show_tblproperties(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, files=1)
    _run(spark, "ALTER TABLE t SET TBLPROPERTIES ('changeDataFeed'='true')", t)
    rows = {r.key: r.value for r in _run(spark, "SHOW TBLPROPERTIES t", t).collect()}
    assert rows["changeDataFeed"] == "true"
    one = _run(spark, "SHOW TBLPROPERTIES t ('changeDataFeed')", t).collect()
    assert [(r.key, r.value) for r in one] == [("changeDataFeed", "true")]
    # unknown key: zero rows, Delta semantics
    assert _run(spark, "SHOW TBLPROPERTIES t ('nope')", t).count() == 0
    with pytest.raises(SqlFrontDoorError, match="SHOW TBLPROPERTIES"):
        _run(spark, "SHOW TBLPROPERTIES t (bad)", t)


def test_create_table_clone_forms(spark, tmp_path):
    """CREATE TABLE ... [SHALLOW|DEEP] CLONE <src> [VERSION AS OF n]
    — Delta's clone surface over TxTable.clone: shallow commits file
    references, the clone point honors time travel, an existing
    target is an error (or an IF NOT EXISTS no-op)."""
    src = _mk(spark, tmp_path, n=10, files=1)
    src.append(spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))

    def rs(name):
        return {
            "s": src,
            "c1": TxTable(spark, str(tmp_path / "c1")),
            "c2": TxTable(spark, str(tmp_path / "c2")),
        }[name]

    out = sqlfront.execute(spark, "CREATE TABLE c1 SHALLOW CLONE s", rs).collect()[0]
    assert out.operation == "SHALLOW CLONE"
    assert rs("c1").snapshot().count() == 15
    # time-traveled clone point: only generation 0
    sqlfront.execute(spark, "CREATE TABLE c2 CLONE s VERSION AS OF 0", rs)
    assert rs("c2").snapshot().count() == 10
    # existing target refuses; IF NOT EXISTS no-ops
    with pytest.raises(SqlFrontDoorError, match="already exists"):
        sqlfront.execute(spark, "CREATE TABLE c1 SHALLOW CLONE s", rs)
    noop = sqlfront.execute(
        spark, "CREATE TABLE IF NOT EXISTS c1 SHALLOW CLONE s", rs
    ).collect()[0]
    assert noop.operation == "CLONE (exists)"
    # the clone is independent: DML on it never touches the source
    rs("c1").delete_where("k < 5")
    assert rs("c1").snapshot().count() == 10 and src.snapshot().count() == 15


def test_create_table_deep_clone(spark, tmp_path):
    src = _mk(spark, tmp_path, n=6, files=1)
    t = TxTable(spark, str(tmp_path / "deep"))
    out = sqlfront.execute(
        spark,
        "CREATE TABLE d DEEP CLONE s",
        lambda n: {"s": src, "d": t}[n],
    ).collect()[0]
    assert out.operation == "DEEP CLONE"
    assert t.snapshot().count() == 6
    # deep = bytes live under the clone's own root
    assert all(f.startswith(t.path) for f in t.files())


def test_front_door_parsers_never_crash_on_fuzz():
    """Hypothesis fuzz over the verb grammars: ANY statement must
    either parse, raise the named SqlFrontDoorError, or be a
    fall-through — never an unhandled exception and never a hang
    (catastrophic regex backtracking would time out here). Parsing is
    pure string work, so no Spark session is needed: execute() is
    probed only through routes() + the per-verb parse step."""
    from hypothesis import given, settings, strategies as st

    keywords = st.sampled_from(
        [
            "SELECT", "UPDATE", "DELETE", "MERGE", "INSERT", "CREATE",
            "OPTIMIZE", "VACUUM", "FSCK", "DESCRIBE", "RESTORE", "ALTER",
            "SHOW", "TABLE", "INTO", "FROM", "SET", "WHERE", "USING",
            "VERSION", "TIMESTAMP", "AS", "OF", "CLONE", "SHALLOW",
            "DEEP", "DETAIL", "HISTORY", "TBLPROPERTIES", "NOT", "NULL",
            "PARTITIONED", "BY", "INT", "BIGINT", "DECIMAL(10,2)",
            "ARRAY<STRING>",
            "t", "`odd name`", "'lit''eral'", '"dq"', "(", ")", ",",
            "=", "*", "0", "42", "1.5", ";", "--", "x.y",
        ]
    )
    statements = st.lists(keywords, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=300, deadline=2000)
    @given(statements)
    def _probe(stmt):
        from hz_csv2parquet_spark.sqlfront import _VERBS, routes

        routes(stmt)  # must never raise
        s = stmt.strip().rstrip(";").strip()
        for pat, parse, _cap in _VERBS:
            if pat.match(s):
                try:
                    parse(s)
                except SqlFrontDoorError:
                    pass  # the named-grammar contract
                break

    _probe()


def test_timestamp_as_of_view_names_are_injective(spark, tmp_path):
    """Advisor r14: two distinct TIMESTAMP AS OF literals on the same
    table that differ ONLY in punctuation ('+01:00' vs '-01:00' —
    different instants!) must land on distinct temp views; the
    sanitize-only name let the second createOrReplaceTempView clobber
    the first inside one statement. Pinned via the rewrite's output
    (the raw-literal digest suffix makes the mapping injective)."""
    import re as _re

    from hz_csv2parquet_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    t = _mk(spark, tmp_path, n=4, files=1)
    stmt = (
        "SELECT (SELECT COUNT(*) FROM t TIMESTAMP AS OF "
        "'2999-01-02 03:04:05+01:00') AS a, (SELECT COUNT(*) FROM t "
        "TIMESTAMP AS OF '2999-01-02 03:04:05-01:00') AS b"
    )
    rewritten = sqlfront._rewrite_time_travel(
        spark, stmt, lambda name: {"t": t}[name]
    )
    views = _re.findall(r"__hz_tt_\w+", rewritten)
    assert len(views) == 2 and views[0] != views[1], rewritten


def test_insert_select_with_version_as_of_body(spark, tmp_path):
    """Advisor r14: Delta allows AS OF inside an INSERT body —
    ``INSERT INTO tgt SELECT ... FROM src VERSION AS OF 0`` used to
    be handed to spark.sql unrewritten and die with a Catalyst parse
    error at the wrong layer. Now the body is time-travel-rewritten
    like a top-level query."""
    src = _mk(spark, tmp_path, n=10, files=1)  # v0: k in [0, 10)
    src.append(
        spark.range(10, 25).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )  # v1
    tgt = TxTable(spark, str(tmp_path / "tgt"), stat_cols=["k"])
    tgt.create(spark.range(0).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("v")))
    out = sqlfront.execute(
        spark,
        "INSERT INTO tgt SELECT * FROM src VERSION AS OF 0",
        lambda n: {"src": src, "tgt": tgt}[n],
    ).collect()[0]
    assert out.operation == "INSERT"
    assert tgt.snapshot().count() == 10  # v0's rows only, not 25
    # unknown table inside the body: hard named error, never a
    # Catalyst fall-through (AS OF is unparseable there)
    with pytest.raises(SqlFrontDoorError, match="nosuch"):
        sqlfront.execute(
            spark,
            "INSERT INTO tgt SELECT * FROM nosuch VERSION AS OF 0",
            lambda n: {"tgt": tgt}[n],
        )
    # foreign TARGET + time-travel body: also a named error — the
    # Spark-capable fall-through would hand the AS OF clause to
    # Catalyst, which cannot parse it
    with pytest.raises(SqlFrontDoorError, match="front door"):
        sqlfront.execute(
            spark,
            "INSERT INTO cat_tbl SELECT * FROM src VERSION AS OF 0",
            lambda n: {"src": src}[n],
        )
    # ...while a foreign target with a PLAIN body still falls through
    assert sqlfront.execute(
        spark,
        "INSERT INTO cat_tbl SELECT 1, 2",
        lambda n: (_ for _ in ()).throw(KeyError(n)),
    ) is None


def test_ctas_with_time_travel_body(spark, tmp_path):
    """Same advisor item, CTAS leg: CREATE TABLE ... AS SELECT ...
    FROM src VERSION AS OF 0 rewrites the body before spark.sql."""
    src = _mk(spark, tmp_path, n=8, files=1)
    src.delete_where("k >= 3")  # v1: 3 rows live
    tgt = TxTable(spark, str(tmp_path / "ctas_tt"), stat_cols=["k"])
    out = sqlfront.execute(
        spark,
        "CREATE TABLE tgt AS SELECT k, v FROM src VERSION AS OF 0",
        lambda n: {"src": src, "tgt": tgt}[n],
    ).collect()[0]
    assert out.operation == "CREATE TABLE"
    assert tgt.snapshot().count() == 8  # pre-delete generation


def test_clone_unknown_table_is_a_named_error(spark, tmp_path):
    """Advisor r14: CLONE parses under the Spark-capable CREATE verb,
    so an unknown source/target used to fall through to spark.sql —
    which cannot parse CLONE. Both sides must stay named errors."""
    src = _mk(spark, tmp_path, n=3, files=1)

    def only_src(name):
        return {"s": src}[name]

    with pytest.raises(SqlFrontDoorError, match="nosuch"):
        sqlfront.execute(
            spark, "CREATE TABLE c SHALLOW CLONE nosuch",
            lambda n: {"c": TxTable(spark, str(tmp_path / "c"))}[n],
        )
    with pytest.raises(SqlFrontDoorError, match="c2"):
        sqlfront.execute(spark, "CREATE TABLE c2 SHALLOW CLONE s", only_src)


def test_describe_detail_reports_clone_localization(spark, tmp_path):
    """numAbsPathFiles (r14 verdict item 5): a fresh shallow clone
    references every file at its source-absolute location; compact()
    localizes — the count must go numFiles -> 0. Also pins the
    dv-aware numRows (advisor r14): after a dv DELETE, numRows ==
    SELECT COUNT(*), not the pre-delete physical sum."""
    src = _mk(spark, tmp_path, n=20, files=2)
    clone = src.clone(str(tmp_path / "cl"))
    r = sqlfront.execute(
        spark, "DESCRIBE DETAIL c", lambda n: {"c": clone}[n]
    ).collect()[0]
    assert r.numAbsPathFiles == r.numFiles > 0
    clone.compact(target_files=1)
    r2 = sqlfront.execute(
        spark, "DESCRIBE DETAIL c", lambda n: {"c": clone}[n]
    ).collect()[0]
    assert r2.numAbsPathFiles == 0 and r2.numRows == 20
    # dv-aware numRows on a merge-on-read DELETE
    dv = TxTable(spark, str(tmp_path / "dv"), stat_cols=["k"],
                 deletion_vectors=True)
    dv.create(spark.range(10).select(F.col("id").alias("k")))
    dv.delete_where("k < 4")
    d = dv.detail()
    assert d["numRows"] == 6 == dv.snapshot().count()


def test_create_table_column_list(spark, tmp_path):
    """Round 15 (r14 verdict residual gap 3): plain column-list
    CREATE TABLE commits an EMPTY table whose schema is the parsed
    DDL; NOT NULL markers become column invariants; PARTITIONED BY
    records the hive layout. Closes the last SQL-surface ergonomic
    seam — a user can now declare a table before any data exists."""
    t = TxTable(spark, str(tmp_path / "decl"), stat_cols=["k"])
    out = sqlfront.execute(
        spark,
        "CREATE TABLE d (k BIGINT NOT NULL, v DECIMAL(10,2), "
        "tags ARRAY<STRING>, p STRING) PARTITIONED BY (p)",
        lambda n: {"d": t}[n],
    ).collect()[0]
    assert out.operation == "CREATE TABLE"
    snap = t.snapshot()
    assert snap.count() == 0
    assert [f.simpleString() for f in snap.schema.fields] == [
        "k:bigint", "v:decimal(10,2)", "tags:array<string>", "p:string",
    ]
    assert t.detail()["partitionColumns"] == ["p"]
    # the NOT NULL invariant is live: a null-k append refuses
    with pytest.raises(Exception, match="(?i)not null|null"):
        t.append(spark.createDataFrame(
            [(None, None, None, "a")],
            "k bigint, v decimal(10,2), tags array<string>, p string",
        ))
    t.append(spark.createDataFrame(
        [(1, None, None, "a")],
        "k bigint, v decimal(10,2), tags array<string>, p string",
    ))
    assert t.snapshot().count() == 1
    # IF NOT EXISTS no-ops on the now-existing table
    noop = sqlfront.execute(
        spark, "CREATE TABLE IF NOT EXISTS d (x INT)",
        lambda n: {"d": t}[n],
    ).collect()[0]
    assert noop.operation == "CREATE TABLE (exists)"
    # named errors: bad column list, undeclared partition column
    t2 = TxTable(spark, str(tmp_path / "decl2"))
    with pytest.raises(SqlFrontDoorError, match="cannot parse column list"):
        sqlfront.execute(spark, "CREATE TABLE d2 (SELECT 1)",
                         lambda n: {"d2": t2}[n])
    with pytest.raises(SqlFrontDoorError, match="undeclared"):
        sqlfront.execute(spark, "CREATE TABLE d2 (k INT) PARTITIONED BY (z)",
                         lambda n: {"d2": t2}[n])


def test_cli_sql_column_list_create_and_insert(tmp_path, spark, capsys):
    """End-to-end through the CLI: declare a table with a column
    list (name registered BEFORE the path exists — the documented
    pre-registration pattern), INSERT into it, read it back."""
    from hz_csv2parquet_spark.cli import main

    tbl = str(tmp_path / "decl_tbl")
    assert main([
        "sql",
        "CREATE TABLE d (k BIGINT NOT NULL, v STRING)",
        "--table", f"d={tbl}",
    ]) == 0
    assert "CREATE TABLE" in capsys.readouterr().out
    assert main([
        "sql", "INSERT INTO d VALUES (1, 'a'), (2, 'b')",
        "--table", f"d={tbl}",
    ]) == 0
    capsys.readouterr()
    assert main([
        "sql", "SELECT COUNT(*) AS n FROM d", "--table", f"d={tbl}",
    ]) == 0
    assert "2" in capsys.readouterr().out
