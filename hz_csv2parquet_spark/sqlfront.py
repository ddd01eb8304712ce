"""SQL front door for transaction-log DML/DDL/maintenance verbs.

``spark.sql`` happily parses ``UPDATE``/``DELETE``/``MERGE`` but a
Python DataSource (our ``hz_txlog``) cannot execute them — Spark
would raise a table-does-not-support-writes error deep inside the
analyzer. This module closes the gap the way Delta's SQL extension
does: recognize the table-verb statements *before* Catalyst sees
them, route them to the :class:`TxTable` verbs (which already take
SQL predicate/expression strings verbatim), and hand every other
statement to ``spark.sql`` untouched.

The supported grammar is deliberately the canonical Delta surface —
one documented form per verb (see each ``_parse_*``); a statement
that starts with a routed keyword but deviates raises
:class:`SqlFrontDoorError` naming what IS supported instead of
falling through to a confusing analyzer error. Expressions
(``WHERE`` predicates, ``SET`` assignments, ``CHECK`` bodies) are
never interpreted here — they pass through as text to the verbs,
which evaluate them with Spark's own parser, so the front door adds
zero expression semantics of its own.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["SqlFrontDoorError", "execute", "routes"]


class SqlFrontDoorError(ValueError):
    """A routed verb was recognized but the statement deviates from
    the supported form (the message states the supported grammar)."""


#: ``identifier`` — bare or backtick-quoted.
_IDENT = r"(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"


def _unquote(ident: str) -> str:
    ident = ident.strip()
    if ident.startswith("`") and ident.endswith("`"):
        return ident[1:-1]
    return ident


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level ``sep`` — outside parens and outside
    single/double/backtick quotes (with ``''`` escape inside single
    quotes, the SQL rule)."""
    parts, depth, quote, start = [], 0, None, 0
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                if quote == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    i += 1  # escaped quote
                else:
                    quote = None
        elif c in "'\"`":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _split_top_kw(s: str, kw: str) -> list[str]:
    """Split on a top-level KEYWORD (case-insensitive, word-bounded),
    same quote/paren rules as :func:`_split_top`."""
    out, depth, quote, start = [], 0, None, 0
    pat = re.compile(rf"(?i)\b{kw}\b")
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                if quote == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    i += 1
                else:
                    quote = None
            i += 1
            continue
        if c in "'\"`":
            quote = c
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                out.append(s[start : i])
                start = i = m.end()
                continue
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out]


def _assignment(item: str) -> tuple[str, str]:
    """``col = expr`` — split on the FIRST top-level ``=`` that is a
    bare assignment (not ``<=``, ``>=``, ``!=``, ``==``)."""
    depth, quote = 0, None
    i = 0
    while i < len(item):
        c = item[i]
        if quote:
            if c == quote:
                if quote == "'" and i + 1 < len(item) and item[i + 1] == "'":
                    i += 1
                else:
                    quote = None
        elif c in "'\"`":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "=" and depth == 0:
            prev = item[i - 1] if i else ""
            nxt = item[i + 1] if i + 1 < len(item) else ""
            if prev not in "<>!=" and nxt != "=":
                col, expr = item[:i].strip(), item[i + 1 :].strip()
                if re.fullmatch(_IDENT, col) and expr:
                    return _unquote(col), expr
                break
        i += 1
    raise SqlFrontDoorError(
        f"SET expects `column = expression`, got: {item.strip()!r}"
    )


def _one_row(spark: SparkSession, operation: str, version) -> DataFrame:
    return spark.createDataFrame(
        [(operation, None if version is None else int(version))],
        "operation string, version bigint",
    )


# ---------------- per-verb parsers ----------------
# Each returns a runner(spark, resolve) -> DataFrame, or raises
# SqlFrontDoorError. `resolve(name)` returns the TxTable for a
# registered table name (raising KeyError for unknown names).


def _parse_update(stmt: str):
    m = re.match(rf"(?is)^UPDATE\s+({_IDENT})\s+SET\s+(.*)$", stmt)
    if not m:
        raise SqlFrontDoorError(
            "supported: UPDATE <table> SET col = expr[, ...] [WHERE <predicate>]"
        )
    name, rest = _unquote(m.group(1)), m.group(2)
    before_where, *where = _split_top_kw(rest, "WHERE")
    if len(where) > 1:
        raise SqlFrontDoorError("UPDATE: one WHERE clause expected")
    pairs = [_assignment(a) for a in _split_top(before_where)]
    # a column assigned twice is a user typo dict() would silently
    # collapse to last-wins; Delta/Spark raise — so do we (advisor r12)
    seen: set[str] = set()
    for col, _ in pairs:
        low = col.lower()
        if low in seen:
            raise SqlFrontDoorError(
                f"UPDATE: column {col!r} assigned more than once in SET"
            )
        seen.add(low)
    assignments = dict(pairs)
    if not assignments:
        raise SqlFrontDoorError("UPDATE: empty SET clause")
    pred = where[0] if where else "true"
    if not pred:
        raise SqlFrontDoorError("UPDATE: empty WHERE predicate")

    def run(spark, resolve):
        v = resolve(name).update_where(pred, assignments)
        return _one_row(spark, "UPDATE", v)

    return run


def _parse_delete(stmt: str):
    m = re.match(
        rf"(?is)^DELETE\s+FROM\s+({_IDENT})\s*(?:WHERE\s+(.+))?$", stmt
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: DELETE FROM <table> [WHERE <predicate>]"
        )
    name, pred = _unquote(m.group(1)), (m.group(2) or "true").strip()

    def run(spark, resolve):
        v = resolve(name).delete_where(pred)
        return _one_row(spark, "DELETE", v)

    return run


def _parse_merge(stmt: str):
    """The canonical upsert only (what ``merge_upsert`` computes):

    MERGE INTO <table> [[AS] t] USING <view | (subquery)> [[AS] s]
    ON <t.k = s.k [AND ...]>
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *
    """
    grammar = (
        "supported: MERGE INTO <table> [[AS] t] USING <view|(subquery)> "
        "[[AS] s] ON t.k = s.k [AND ...] WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    m = re.match(
        rf"(?is)^MERGE\s+INTO\s+({_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?"
        rf"\s+USING\s+(.*)$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(grammar)
    name = _unquote(m.group(1))
    t_alias = _unquote(m.group(2)) if m.group(2) else name
    rest = m.group(3)
    on_split = _split_top_kw(rest, "ON")
    if len(on_split) != 2:
        raise SqlFrontDoorError(grammar)
    src_part, after_on = on_split
    # source: `(subquery) [AS] s` or `view [AS] s`
    sm = re.match(
        rf"(?s)^(\(.*\)|{_IDENT})\s*(?:(?:AS\s+)?({_IDENT}))?\s*$", src_part
    )
    if not sm:
        raise SqlFrontDoorError(grammar)
    src, s_alias = sm.group(1), sm.group(2)
    s_alias = _unquote(s_alias) if s_alias else (None if src.startswith("(") else _unquote(src))
    if s_alias is None:
        raise SqlFrontDoorError("MERGE: a (subquery) source needs an alias")
    when_parts = _split_top_kw(after_on, "WHEN")
    cond = when_parts[0]
    clauses = [re.sub(r"(?s)\s+", " ", w).strip().upper() for w in when_parts[1:]]
    if sorted(clauses) != sorted(
        ["MATCHED THEN UPDATE SET *", "NOT MATCHED THEN INSERT *"]
    ):
        raise SqlFrontDoorError(grammar)
    keys = []
    for conj in _split_top_kw(cond, "AND"):
        cm = re.match(
            rf"(?s)^\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*$",
            conj,
        )
        if not cm:
            raise SqlFrontDoorError(
                "MERGE ON: conjunctions of t.col = s.col equalities only"
            )
        a_al, a_col, b_al, b_col = (_unquote(g) for g in cm.groups())
        sides = {a_al: a_col, b_al: b_col}
        if set(sides) != {t_alias, s_alias}:
            raise SqlFrontDoorError(
                f"MERGE ON: each equality must join {t_alias!r} to {s_alias!r}"
            )
        if sides[t_alias] != sides[s_alias]:
            raise SqlFrontDoorError(
                "MERGE ON: target and source key columns must share a name "
                f"(got {sides[t_alias]!r} = {sides[s_alias]!r}); alias the "
                "source column in a subquery"
            )
        keys.append(sides[t_alias])
    if not keys:
        raise SqlFrontDoorError(grammar)

    def run(spark, resolve):
        updates = (
            spark.sql(src[1:-1]) if src.startswith("(") else spark.table(src)
        )
        v = resolve(name).merge_upsert(updates, keys)
        return _one_row(spark, "MERGE", v)

    return run


def _parse_insert(stmt: str):
    """``INSERT INTO <table> <query>`` (blind append — exactly the
    Delta INSERT INTO semantics) or ``INSERT OVERWRITE [TABLE]
    <table> <query>`` — routed through the DSv2 sink's atomic
    overwrite commit (sources/txlog_source.py ``mode("overwrite")``):
    the staged adds and the removal of every live file land in ONE
    commit, so readers flip atomically and the superseded generation
    stays time-travelable. Both verbs share the positional-cast
    column alignment."""
    m = re.match(
        rf"(?is)^INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})"
        rf"(?:\s*\(([^)]*)\))?\s+(.+)$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: INSERT INTO|OVERWRITE <table> [(col[, ...])] "
            "<SELECT ...> | VALUES (...)[, ...]"
        )
    overwrite = m.group(1).upper() == "OVERWRITE"
    name, body = _unquote(m.group(2)), m.group(4).strip()
    if overwrite and m.group(3) is not None:
        # a partial-column overwrite would null the omitted columns of
        # EVERY row in the table — refuse rather than guess (Delta's
        # INSERT OVERWRITE likewise takes the full row shape)
        raise SqlFrontDoorError(
            "INSERT OVERWRITE replaces whole rows — no column list"
        )
    col_list = (
        [_unquote(c) for c in _split_top(m.group(3))]
        if m.group(3) is not None
        else None
    )
    if col_list is not None and not col_list:
        raise SqlFrontDoorError("INSERT INTO: empty column list")
    if not re.match(r"(?is)^(SELECT|VALUES|WITH|TABLE|\()", body):
        raise SqlFrontDoorError(
            "INSERT INTO expects a SELECT/VALUES/WITH query body"
        )

    def run(spark, resolve):
        tbl = _resolve_tt_target(resolve, name, body, f"INSERT INTO {name}")
        rows = spark.sql(_rewrite_body_time_travel(spark, body, resolve))
        # VALUES and untyped literals land as whatever Spark infers —
        # align names/types to the table schema positionally so an
        # INSERT of (1, 10) into (k bigint, v bigint) round-trips
        from pyspark.sql.types import StructType
        import json as _json

        state = tbl._replay_state()
        committed = StructType.fromJson(_json.loads(state["schema"]))
        if col_list is None:
            # identity columns are engine-assigned: a positional
            # INSERT supplies every OTHER column (the Delta rule)
            fields = [
                f
                for f in committed.fields
                if f.name not in (state.get("identity") or {})
            ]
        else:
            # explicit column list: align by the NAMED columns —
            # omitted generated columns compute in the append,
            # omitted nullable columns null-fill on read (schema
            # evolution machinery); identity names are refused there
            if len({c.lower() for c in col_list}) != len(col_list):
                raise SqlFrontDoorError(
                    f"INSERT INTO {name}: duplicate column in list"
                )
            by_name = {f.name.lower(): f for f in committed.fields}
            missing = [c for c in col_list if c.lower() not in by_name]
            if missing:
                raise SqlFrontDoorError(
                    f"INSERT INTO {name}: unknown column(s) {missing}"
                )
            fields = [by_name[c.lower()] for c in col_list]
        if len(rows.columns) != len(fields):
            raise SqlFrontDoorError(
                f"INSERT INTO {name}: query produces {len(rows.columns)} "
                f"column(s), {'column list names' if col_list else 'table takes'} "
                f"{len(fields)}"
            )
        rows = rows.select(
            *[
                F.col(c).cast(f.dataType).alias(f.name)
                for c, f in zip(rows.columns, fields)
            ]
        )
        if overwrite:
            # the DSv2 sink stages the new generation, then removes
            # every live file and adds the staged set in one commit
            # (conflict-checked against racing writers); it fails
            # closed on identity tables, which need the id-reserving
            # TxTable path
            from .sources.txlog_source import register_txlog_source

            register_txlog_source(spark)
            rows.write.format("hz_txlog").mode("overwrite").save(tbl.path)
            return _one_row(spark, "INSERT OVERWRITE", tbl.version())
        v = tbl.append(rows)
        return _one_row(spark, "INSERT", v)

    return run


def _clone_runner(cm: re.Match):
    """``CREATE TABLE <tgt> [SHALLOW|DEEP] CLONE <src> [AS OF ...]``
    — Delta's clone surface on the existing :meth:`TxTable.clone`
    machinery: SHALLOW (default) commits file REFERENCES (O(files)
    driver metadata, zero bytes whatever the table size); DEEP copies
    the bytes on the executors. Both accept a clone point via the
    time-travel forms."""
    if_not_exists = bool(cm.group(1))
    tgt, deep = _unquote(cm.group(2)), bool(cm.group(3) and "deep" in cm.group(3).lower())
    src = _unquote(cm.group(4))
    version = int(cm.group(5)) if cm.group(5) else None
    ts = cm.group(6)

    def run(spark, resolve):
        # CLONE is lakehouse-only syntax — Catalyst cannot parse it,
        # so an unregistered target/source must stay a NAMED error
        # here; the CREATE verb's Spark-capable fall-through would
        # otherwise re-hand the statement to spark.sql for a raw
        # syntax error at the wrong layer (advisor r14)
        try:
            target = resolve(tgt)
            if target.version() >= 0:
                if if_not_exists:
                    return _one_row(spark, "CLONE (exists)", target.version())
                raise SqlFrontDoorError(
                    f"table {tgt!r} already exists — clone targets a fresh "
                    "path (or use IF NOT EXISTS for a no-op)"
                )
            c = resolve(src).clone(
                target.path, version=version, timestamp=ts, deep=deep
            )
        except _UnknownTable as e:
            raise SqlFrontDoorError(str(e)) from None
        return _one_row(spark, "DEEP CLONE" if deep else "SHALLOW CLONE", c.version())

    return run


def _column_list_create_runner(dm: re.Match, grammar: str):
    """``CREATE TABLE t (a INT [NOT NULL], ...) [PARTITIONED BY
    (...)]`` — commit an EMPTY table whose schema is the parsed DDL
    (Delta's plain CREATE TABLE). The column defs pass to Spark's own
    DDL parser verbatim (minus the NOT NULL markers, which the struct
    literal can't carry); each NOT NULL column then gets its invariant
    logged via ``set_not_null`` — trivially satisfiable on an empty
    snapshot, enforced on every later write. One data-free commit
    plus one metadata commit per invariant, O(1) whatever the future
    table size."""
    if_not_exists = bool(dm.group(2))
    name, defs_raw = _unquote(dm.group(3)), dm.group(4)
    part_cols = (
        [_unquote(c) for c in _split_top(dm.group(5))]
        if dm.group(5) is not None
        else None
    )
    defs, not_null = [], []
    for item in _split_top(defs_raw):
        item = item.strip()
        cm = re.match(
            rf"(?s)^({_IDENT})\s+(.+?)(\s+NOT\s+NULL)?$", item, re.IGNORECASE
        )
        if not cm or not cm.group(2).strip():
            raise SqlFrontDoorError(grammar)
        col, typ = _unquote(cm.group(1)), cm.group(2).strip()
        defs.append((col, typ))
        if cm.group(3):
            not_null.append(col)
    if not defs:
        raise SqlFrontDoorError(grammar)
    if part_cols is not None:
        known = {c.lower() for c, _ in defs}
        missing = [c for c in part_cols if c.lower() not in known]
        if missing:
            raise SqlFrontDoorError(
                f"PARTITIONED BY names undeclared column(s) {missing}"
            )

    def run(spark, resolve):
        tbl = resolve(name)
        if tbl.version() >= 0:
            if if_not_exists:
                return _one_row(spark, "CREATE TABLE (exists)", tbl.version())
            raise SqlFrontDoorError(
                f"table {name!r} already exists — use CREATE OR REPLACE "
                "TABLE ... AS <query> (or IF NOT EXISTS)"
            )
        from pyspark.sql.types import StructType

        try:
            schema = StructType.fromDDL(
                ", ".join(f"`{c}` {t}" for c, t in defs)
            )
        except Exception as e:
            raise SqlFrontDoorError(
                f"CREATE TABLE {name}: cannot parse column list "
                f"({e}) — {grammar}"
            ) from None
        v = tbl.create(
            spark.createDataFrame([], schema), partition_by=part_cols
        )
        for col in not_null:
            v = tbl.set_not_null(col)
        return _one_row(spark, "CREATE TABLE", v)

    return run


def _parse_create(stmt: str):
    """``CREATE [OR REPLACE] TABLE <name> AS <query>`` and
    ``CREATE TABLE IF NOT EXISTS <name> AS <query>`` — CTAS into a
    registered transaction-log table path, plus the clone form
    (see :func:`_clone_runner`) and the plain column-list form
    ``CREATE TABLE t (a INT [NOT NULL], ...) [PARTITIONED BY (...)]``
    (round 15 — commits an EMPTY table whose schema comes from the
    parsed DDL; NOT NULL markers become column invariants via
    :meth:`TxTable.set_not_null`, the Delta shape). OR REPLACE on an
    existing table routes through the DSv2 sink's atomic overwrite
    with overwriteSchema (one commit; the old generation stays
    time-travelable — Delta's REPLACE TABLE shape); OR REPLACE with
    a column list is refused (replacement takes its schema from a
    query — use AS SELECT)."""
    grammar = (
        "supported: CREATE [OR REPLACE] TABLE [IF NOT EXISTS] <table> "
        "AS <SELECT ...> | CREATE TABLE [IF NOT EXISTS] <table> "
        "(col TYPE [NOT NULL][, ...]) [PARTITIONED BY (col[, ...])] "
        "| CREATE TABLE [IF NOT EXISTS] <table> "
        "[SHALLOW|DEEP] CLONE <source> [VERSION AS OF <n> | TIMESTAMP "
        "AS OF '<ts>']"
    )
    cm = re.match(
        rf"(?is)^CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s+"
        rf"(SHALLOW\s+|DEEP\s+)?CLONE\s+({_IDENT})"
        rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        rf"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*$",
        stmt,
    )
    if cm:
        return _clone_runner(cm)
    dm = re.match(
        rf"(?is)^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
        rf"(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*"
        # lazy body + anchored optional suffix: the shortest paren
        # span whose TAIL parses as [PARTITIONED BY (...)] EOF — a
        # greedy body would swallow the suffix into the column list
        rf"\((.+?)\)\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\))?\s*$",
        stmt,
    )
    if dm:
        if dm.group(1):
            raise SqlFrontDoorError(
                "CREATE OR REPLACE TABLE takes its schema from a query "
                "(AS SELECT ...), not a column list"
            )
        return _column_list_create_runner(dm, grammar)
    m = re.match(
        rf"(?is)^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
        rf"(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s+AS\s+(.+)$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(grammar)
    replace = bool(m.group(1))
    if_not_exists = bool(m.group(2))
    if replace and if_not_exists:
        raise SqlFrontDoorError(
            "CREATE TABLE: OR REPLACE and IF NOT EXISTS are exclusive"
        )
    name, body = _unquote(m.group(3)), m.group(4).strip()
    if not re.match(r"(?is)^(SELECT|VALUES|WITH|TABLE|\()", body):
        raise SqlFrontDoorError(grammar)

    def run(spark, resolve):
        tbl = _resolve_tt_target(resolve, name, body, f"CREATE TABLE {name}")
        rows = spark.sql(_rewrite_body_time_travel(spark, body, resolve))
        if tbl.version() >= 0:
            if if_not_exists:
                # the Spark/Delta contract: an existing table is left
                # untouched and the statement succeeds as a no-op
                return _one_row(spark, "CREATE TABLE (exists)", tbl.version())
            if not replace:
                raise SqlFrontDoorError(
                    f"table {name!r} already exists — use CREATE OR "
                    "REPLACE TABLE (or IF NOT EXISTS)"
                )
            from .sources.txlog_source import register_txlog_source

            register_txlog_source(spark)
            (
                rows.write.format("hz_txlog")
                .mode("overwrite")
                .option("overwriteSchema", "true")
                .save(tbl.path)
            )
            return _one_row(spark, "CREATE OR REPLACE", tbl.version())
        v = tbl.create(rows)
        return _one_row(spark, "CREATE TABLE", v)

    return run


def _parse_optimize(stmt: str):
    m = re.match(
        rf"(?is)^OPTIMIZE\s+({_IDENT})"
        rf"(?:\s+WHERE\s+(.*?))?"
        rf"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: OPTIMIZE <table> [WHERE <partition predicate>] "
            "[ZORDER BY (col[, ...])]"
        )
    name = _unquote(m.group(1))
    where = m.group(2).strip() if m.group(2) else None
    zcols = None
    if m.group(3) is not None:
        zcols = [_unquote(c) for c in _split_top(m.group(3))]
        if not zcols:
            raise SqlFrontDoorError("ZORDER BY needs at least one column")

    def run(spark, resolve):
        if zcols and len(zcols) == 1:
            # one-column z-order IS linear clustering — route to the
            # layout-key sort (compact's zorder needs >= 2 columns)
            v = resolve(name).compact(layout_key=zcols[0], where=where)
        else:
            v = resolve(name).compact(zorder=zcols, where=where)
        return _one_row(spark, "OPTIMIZE", v)

    return run


def _parse_vacuum(stmt: str):
    m = re.match(
        rf"(?is)^VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?"
        rf"(\s+DRY\s+RUN)?(\s+FORCE)?\s*$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: VACUUM <table> [RETAIN <n> HOURS] [DRY RUN] [FORCE]"
        )
    name = _unquote(m.group(1))
    hours = float(m.group(2)) if m.group(2) else None
    dry = bool(m.group(3))
    force = bool(m.group(4))
    if hours is not None and not force:
        # Delta's retentionDurationCheck, verbatim reasoning (advisor
        # r12 medium): staging precedes the log commit by design, so a
        # sub-default window can delete a concurrent writer's staged-
        # but-uncommitted files (its later commit then references
        # missing data) — and destroys time travel. Short windows need
        # an explicit FORCE acknowledging both risks. DRY RUN is NOT
        # exempt: its file count is the operator's preview of exactly
        # the deletion the floor exists to question.
        from .sources.txlog import DEFAULT_VACUUM_RETENTION_S

        floor_h = DEFAULT_VACUUM_RETENTION_S / 3600.0
        if hours * 3600.0 < DEFAULT_VACUUM_RETENTION_S:
            raise SqlFrontDoorError(
                f"VACUUM RETAIN {m.group(2)} HOURS is below the "
                f"{floor_h:g}-hour retention floor; a short window can "
                "delete files a concurrent writer has staged but not "
                "yet committed, and breaks time travel — append FORCE "
                "to override"
            )

    def run(spark, resolve):
        tbl = resolve(name)
        kwargs = {"dry_run": dry}
        if hours is not None:
            kwargs["retention_seconds"] = hours * 3600.0
        n = tbl.vacuum(**kwargs)
        return spark.createDataFrame(
            [(n,)], "files_deleted bigint" if not dry else "files_deletable bigint"
        )

    return run


def _parse_fsck(stmt: str):
    m = re.match(
        rf"(?is)^FSCK\s+REPAIR\s+TABLE\s+({_IDENT})(\s+DRY\s+RUN)?\s*$", stmt
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: FSCK REPAIR TABLE <table> [DRY RUN]"
        )
    name, dry = _unquote(m.group(1)), bool(m.group(2))

    def run(spark, resolve):
        missing = resolve(name).fsck_repair(dry_run=dry)
        return spark.createDataFrame(
            [(rel,) for rel in missing] or [],
            "removed_file string",
        )

    return run


def _parse_show_tblproperties(stmt: str):
    """SHOW TBLPROPERTIES <table> [('key')] — the read half of ALTER
    TABLE ... SET TBLPROPERTIES: one (key, value) row per logged
    property, or just the named key's row (Delta's single-key form).
    An unknown key returns zero rows, matching Delta."""
    m = re.match(
        rf"(?is)^SHOW\s+TBLPROPERTIES\s+({_IDENT})"
        rf"(?:\s*\(\s*'([^']+)'\s*\))?\s*$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: SHOW TBLPROPERTIES <table> [('key')]"
        )
    name, key = _unquote(m.group(1)), m.group(2)

    def run(spark, resolve):
        props = resolve(name).detail()["properties"]
        rows = [
            (k, str(v).lower() if isinstance(v, bool) else str(v))
            for k, v in sorted(props.items())
            if key is None or k == key
        ]
        return spark.createDataFrame(rows, "key string, value string")

    return run


def _parse_describe_detail(stmt: str):
    m = re.match(rf"(?is)^DESCRIBE\s+DETAIL\s+({_IDENT})\s*$", stmt)
    if not m:
        raise SqlFrontDoorError("supported: DESCRIBE DETAIL <table>")
    name = _unquote(m.group(1))

    def run(spark, resolve):
        import json as _json

        d = resolve(name).detail()
        row = (
            d["format"],
            d["location"],
            int(d["version"]),
            int(d["numFiles"]),
            int(d["sizeInBytes"]),
            int(d["numRows"]),
            int(d["numAbsPathFiles"]),
            d["partitionColumns"],
            _json.dumps(d["properties"], sort_keys=True),
            _json.dumps(d["constraints"], sort_keys=True),
            d["writerFeatures"],
            None if d["lastModified"] is None else float(d["lastModified"]),
        )
        return spark.createDataFrame(
            [row],
            "format string, location string, version bigint, "
            "numFiles bigint, sizeInBytes bigint, numRows bigint, "
            "numAbsPathFiles bigint, "
            "partitionColumns array<string>, properties string, "
            "constraints string, writerFeatures array<string>, "
            "lastModified double",
        )

    return run


def _parse_describe_history(stmt: str):
    m = re.match(
        rf"(?is)^DESCRIBE\s+HISTORY\s+({_IDENT})(?:\s+LIMIT\s+(\d+))?\s*$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: DESCRIBE HISTORY <table> [LIMIT <n>]"
        )
    name = _unquote(m.group(1))
    limit = int(m.group(2)) if m.group(2) else None

    def run(spark, resolve):
        return resolve(name).history(limit)

    return run


def _parse_restore(stmt: str):
    m = re.match(
        rf"(?is)^RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
        rf"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*$",
        stmt,
    )
    if not m:
        raise SqlFrontDoorError(
            "supported: RESTORE [TABLE] <table> TO VERSION AS OF <n> | "
            "TO TIMESTAMP AS OF '<ts>'"
        )
    name = _unquote(m.group(1))
    version = int(m.group(2)) if m.group(2) else None
    ts = m.group(3)

    def run(spark, resolve):
        tbl = resolve(name)
        v = tbl.restore(version if version is not None else tbl.version_at(ts))
        return _one_row(spark, "RESTORE", v)

    return run


def _parse_alter(stmt: str):
    grammar = (
        "supported ALTER TABLE forms: RENAME COLUMN a TO b | DROP COLUMN a | "
        "ADD CONSTRAINT name CHECK (expr) | DROP CONSTRAINT name | "
        "ALTER COLUMN a SET NOT NULL | ALTER COLUMN a DROP NOT NULL | "
        "SET TBLPROPERTIES ('k'='v'[, ...])"
    )
    m = re.match(rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+(.*)$", stmt)
    if not m:
        raise SqlFrontDoorError(grammar)
    name, rest = _unquote(m.group(1)), m.group(2).strip()

    rm = re.match(
        rf"(?is)^RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$", rest
    )
    if rm:
        old, new = _unquote(rm.group(1)), _unquote(rm.group(2))

        def run(spark, resolve):
            return _one_row(spark, "RENAME COLUMN", resolve(name).rename_column(old, new))

        return run
    dm = re.match(rf"(?is)^DROP\s+COLUMN\s+({_IDENT})\s*$", rest)
    if dm:
        col = _unquote(dm.group(1))

        def run(spark, resolve):
            return _one_row(spark, "DROP COLUMN", resolve(name).drop_column(col))

        return run
    nn = re.match(
        rf"(?is)^ALTER\s+COLUMN\s+({_IDENT})\s+(SET|DROP)\s+NOT\s+NULL\s*$",
        rest,
    )
    if nn:
        col, which = _unquote(nn.group(1)), nn.group(2).upper()

        def run(spark, resolve):
            tbl = resolve(name)
            if which == "SET":
                # history validated from the logged null counts first
                # (O(files) log arithmetic); scan only uncounted files
                return _one_row(spark, "SET NOT NULL", tbl.set_not_null(col))
            return _one_row(spark, "DROP NOT NULL", tbl.drop_not_null(col))

        return run
    am = re.match(
        rf"(?is)^ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.*)\)\s*$", rest
    )
    if am:
        cname, expr = _unquote(am.group(1)), am.group(2).strip()

        def run(spark, resolve):
            return _one_row(
                spark, "ADD CONSTRAINT", resolve(name).add_constraint(cname, expr)
            )

        return run
    cm = re.match(rf"(?is)^DROP\s+CONSTRAINT\s+({_IDENT})\s*$", rest)
    if cm:
        cname = _unquote(cm.group(1))

        def run(spark, resolve):
            return _one_row(
                spark, "DROP CONSTRAINT", resolve(name).drop_constraint(cname)
            )

        return run
    pm = re.match(rf"(?is)^SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", rest)
    if pm:
        props = {}
        for item in _split_top(pm.group(1)):
            kv = re.match(r"(?s)^\s*'([^']+)'\s*=\s*'([^']*)'\s*$", item)
            if not kv:
                raise SqlFrontDoorError(
                    "SET TBLPROPERTIES expects 'key'='value' pairs"
                )
            val = kv.group(2).lower()
            if val not in ("true", "false"):
                raise SqlFrontDoorError(
                    f"property {kv.group(1)!r}: only 'true'/'false' values "
                    "are supported"
                )
            props[kv.group(1)] = val == "true"

        def run(spark, resolve):
            return _one_row(
                spark, "SET TBLPROPERTIES", resolve(name).set_properties(**props)
            )

        return run
    raise SqlFrontDoorError(grammar)


#: (pattern, parser, spark_capable). ``spark_capable`` verbs are
#: statements Catalyst can legitimately execute against its OWN
#: catalog/temp tables (INSERT, the ALTER TABLE family) — when their
#: target is not a registered txlog table, execute() falls through to
#: ``spark.sql`` instead of erroring (advisor r12: the front door must
#: not regress behavior for non-txlog targets). The lakehouse-only
#: verbs (UPDATE/DELETE/MERGE/OPTIMIZE/VACUUM/FSCK/RESTORE/DESCRIBE
#: HISTORY) keep the named unknown-table error: Spark cannot run them
#: without a transactional table layer, so a misspelled name must say
#: so rather than bounce off Catalyst with a worse message.
_VERBS: list[tuple[re.Pattern, Callable, bool]] = [
    (re.compile(r"(?is)^\s*UPDATE\b"), _parse_update, False),
    (re.compile(r"(?is)^\s*DELETE\b"), _parse_delete, False),
    (re.compile(r"(?is)^\s*MERGE\b"), _parse_merge, False),
    (re.compile(r"(?is)^\s*INSERT\b"), _parse_insert, True),
    (re.compile(r"(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\b"), _parse_create, True),
    (re.compile(r"(?is)^\s*OPTIMIZE\b"), _parse_optimize, False),
    (re.compile(r"(?is)^\s*VACUUM\b"), _parse_vacuum, False),
    (re.compile(r"(?is)^\s*FSCK\b"), _parse_fsck, False),
    (re.compile(r"(?is)^\s*SHOW\s+TBLPROPERTIES\b"), _parse_show_tblproperties, False),
    (re.compile(r"(?is)^\s*DESCRIBE\s+DETAIL\b"), _parse_describe_detail, False),
    (re.compile(r"(?is)^\s*DESCRIBE\s+HISTORY\b"), _parse_describe_history, False),
    (re.compile(r"(?is)^\s*RESTORE\b"), _parse_restore, False),
    (re.compile(r"(?is)^\s*ALTER\s+TABLE\b"), _parse_alter, True),
]


class _UnknownTable(SqlFrontDoorError):
    """resolve() raised KeyError — the statement's target is not a
    registered transaction-log table."""


#: Delta's SQL time-travel grammar on a query's FROM/JOIN items:
#: ``FROM t VERSION AS OF 3`` / ``FROM t TIMESTAMP AS OF '...'``
#: (the clause precedes any alias, as in Delta). The timestamp
#: literal is single-quoted (with '' escaping) or a bare epoch
#: number.
_TT_CLAUSE = re.compile(
    rf"(?is)\b(FROM|JOIN)\s+({_IDENT})\s+"
    rf"(?:VERSION\s+AS\s+OF\s+(\d+)"
    rf"|TIMESTAMP\s+AS\s+OF\s+('(?:[^']|'')*'|\d+(?:\.\d+)?))"
)

#: statements the time-travel rewrite applies to (query heads — the
#: DML verbs own their own grammar and never carry AS OF).
_QUERY_HEAD = re.compile(r"(?is)^\s*(?:SELECT|WITH|TABLE|\()")

#: single-quoted ('' escape) and double-quoted strings — Spark's
#: default parser reads BOTH as string literals (double quotes are
#: identifiers only under spark.sql.ansi.doubleQuotedIdentifiers)
_STR_LITERAL = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")


def _mask_literals(stmt: str) -> str:
    """Length-preserving copy with every string literal's CONTENT
    blanked — so the time-travel grammar can never match text inside
    a string (``WHERE note = '... VERSION AS OF 1'`` must not be
    rewritten). Same-length masking keeps every match span valid on
    the original statement."""
    return _STR_LITERAL.sub(
        lambda m: m.group(0)[0] + " " * (len(m.group(0)) - 2) + m.group(0)[-1],
        stmt,
    )


def _tt_clause(stmt: str) -> re.Match | None:
    return _TT_CLAUSE.search(_mask_literals(stmt))


def _rewrite_time_travel(
    spark: SparkSession, stmt: str, resolve: Callable[[str], object]
) -> str:
    """Rewrite every ``VERSION AS OF`` / ``TIMESTAMP AS OF`` clause to
    a temp view over the DSv2 as-of read (``asOf`` resolves the
    historical file set through add/remove log replay; ``timestampAsOf``
    picks the latest commit at or before the timestamp via the
    checkpoint timestamp index). Catalyst has no AS OF on Python data
    sources, so the front door owns this syntax; a non-txlog target is
    a named error, not a silent pass-through that Catalyst would
    reject with a parse error pointing at the wrong layer."""

    def _view_for(m: re.Match) -> str:
        # match spans come from the literal-masked copy (same length
        # as the original), so every group is re-read from the
        # ORIGINAL statement — the masked copy blanks the timestamp
        # literal's own content
        kw = stmt[slice(*m.span(1))]
        name = _unquote(stmt[slice(*m.span(2))])
        ver = stmt[slice(*m.span(3))] if m.group(3) is not None else None
        ts = stmt[slice(*m.span(4))] if m.group(4) is not None else None
        try:
            t = resolve(name)
        except KeyError:
            clause = " ".join(stmt[slice(*m.span(0))].split()[2:])
            raise _UnknownTable(
                f"time travel ({clause!r}) requires a registered "
                f"transaction-log table, and {name!r} is not one "
                "(pass --table name=path)"
            ) from None
        reader = spark.read.format("hz_txlog")
        # a backticked table name may contain characters a view name
        # cannot — sanitize, and suffix a short path digest so two
        # names that sanitize identically (`a-b` vs `a_b`) can never
        # share a view; the (path, version) pair makes any remaining
        # collision a no-op replace of an identical definition
        import hashlib

        safe = (
            re.sub(r"[^0-9A-Za-z]", "_", name)
            + "_"
            + hashlib.md5(t.path.encode()).hexdigest()[:8]
        )
        if ver is not None:
            reader = reader.option("asOf", ver)
            view = f"__hz_tt_{safe}_v{ver}"
        else:
            raw = ts.strip()
            if raw.startswith("'"):
                raw = raw[1:-1].replace("''", "'")
            reader = reader.option("timestampAsOf", raw)
            # the sanitized literal is NOT injective ('00:00:00' and
            # '00-00-00' collide) — a raw-literal digest keeps two
            # distinct timestamps on the same table on distinct views
            view = (
                f"__hz_tt_{safe}_t"
                f"{re.sub(r'[^0-9A-Za-z]', '_', raw)}"
                f"_{hashlib.md5(raw.encode()).hexdigest()[:8]}"
            )
        reader.load(t.path).createOrReplaceTempView(view)
        return f"{kw} {view}"

    # search on the masked copy; splice on the original by span
    out, pos = [], 0
    for m in _TT_CLAUSE.finditer(_mask_literals(stmt)):
        out.append(stmt[pos : m.start()])
        out.append(_view_for(m))
        pos = m.end()
    out.append(stmt[pos:])
    return "".join(out)


def _resolve_tt_target(
    resolve: Callable[[str], object], name: str, body: str, what: str
):
    """Resolve a verb's TARGET table, but when the target is foreign
    AND the query body carries a time-travel clause, raise a NAMED
    error instead of letting the Spark-capable fall-through hand the
    whole statement (AS OF clause included) to Catalyst, which cannot
    parse it."""
    try:
        return resolve(name)
    except _UnknownTable:
        if _tt_clause(body):
            raise SqlFrontDoorError(
                f"{what}: target is not a registered transaction-log "
                "table, and the query body carries a VERSION/TIMESTAMP "
                "AS OF clause only the front door can execute "
                "(pass --table name=path)"
            ) from None
        raise


def _rewrite_body_time_travel(
    spark: SparkSession, body: str, resolve: Callable[[str], object]
) -> str:
    """Time-travel rewrite for a query BODY nested inside a routed
    verb (``INSERT INTO t SELECT ... FROM s VERSION AS OF 2``, CTAS)
    — Delta supports AS OF there too, and before this existed such a
    clause fell through to ``spark.sql(body)`` and died with a
    Catalyst parse error pointing at the wrong layer (advisor r14).
    No statement Catalyst can parse carries AS OF, so an unknown
    table here is a hard named error, never the Spark-capable
    fall-through (which would re-hand the unparseable clause to
    Catalyst)."""
    if not _tt_clause(body):
        return body
    try:
        return _rewrite_time_travel(spark, body, resolve)
    except _UnknownTable as e:
        raise SqlFrontDoorError(str(e)) from None


def routes(statement: str) -> bool:
    """True iff the statement starts with a front-door verb, or is a
    query carrying the time-travel grammar (so it will NOT be handed
    to ``spark.sql`` unrewritten)."""
    stmt = statement.strip().rstrip(";")
    if _QUERY_HEAD.match(stmt) and _tt_clause(stmt):
        return True
    return any(pat.match(stmt) for pat, _, _ in _VERBS)


def execute(
    spark: SparkSession,
    statement: str,
    resolve: Callable[[str], object],
) -> DataFrame | None:
    """Route a table-verb statement to the resolved :class:`TxTable`,
    returning its result as a DataFrame (a one-row operation/version
    summary for the mutating verbs, the audit table for DESCRIBE
    HISTORY, the file count for VACUUM). Returns ``None`` when the
    statement is not a front-door verb — the caller runs it through
    ``spark.sql`` as usual. ``resolve(name)`` maps a statement's
    table name to its TxTable; a KeyError becomes either a named
    :class:`SqlFrontDoorError` (lakehouse-only verbs) or — for verbs
    Catalyst itself supports against its catalog (INSERT, ALTER
    TABLE) — a ``None`` return, so the caller's ``spark.sql`` path
    executes the statement against the non-txlog target."""
    stmt = statement.strip().rstrip(";").strip()

    if _QUERY_HEAD.match(stmt) and _tt_clause(stmt):
        # SELECT ... FROM t VERSION AS OF n / TIMESTAMP AS OF '...' —
        # rewrite each clause to a DSv2 as-of temp view, then let
        # Catalyst run the (now plain) query
        return spark.sql(_rewrite_time_travel(spark, stmt, resolve))

    def _target_is_foreign(verb_stmt: str) -> bool:
        """True iff the statement's table target is extractable AND
        not in the caller's registry — the fall-through condition for
        Spark-capable verbs whose statement our grammar refuses."""
        tm = re.match(
            rf"(?is)^\s*(?:INSERT\s+(?:INTO|OVERWRITE)\s+(?:TABLE\s+)?"
            rf"|ALTER\s+TABLE\s+"
            rf"|CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+"
            rf"(?:IF\s+NOT\s+EXISTS\s+)?)({_IDENT})",
            verb_stmt,
        )
        if not tm:
            return False
        try:
            resolve(_unquote(tm.group(1)))
        except KeyError:
            return True
        return False

    for pat, parse, spark_capable in _VERBS:
        if pat.match(stmt):
            try:
                run = parse(stmt)
            except SqlFrontDoorError:
                if spark_capable and _target_is_foreign(stmt):
                    # a shape OUR grammar refuses may still be valid
                    # Spark SQL (e.g. ALTER TABLE ... ADD COLUMN on a
                    # catalog table) — if the target is not a txlog
                    # table, Catalyst owns the verdict. For registered
                    # tables the named grammar error stands.
                    return None
                raise

            def resolve_named(name: str):
                try:
                    return resolve(name)
                except KeyError:
                    raise _UnknownTable(
                        f"{name!r} is not a registered transaction-log table "
                        "(pass --table name=path)"
                    ) from None

            try:
                return run(spark, resolve_named)
            except _UnknownTable:
                if spark_capable:
                    return None
                raise
    return None
