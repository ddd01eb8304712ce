"""Append-only transaction log over plain parquet — the production
story behind the simulated lakehouse ops (SURVEY E105 merge, E126
schema evolution, E127 compaction; VERDICT r5 "What's missing" §3).

Public-knowledge design (the open Delta Lake / Iceberg protocol
shape; no proprietary format): a table is a directory of parquet
data files plus ``_txlog/<version 8-digit>.json`` commit files, each
holding a JSON list of actions:

- ``{"add":    {"path", "rows", "stats": {col: [min, max]}}}``
- ``{"remove": {"path"}}``
- ``{"meta":   {"schema": <DDL string>}}``

The CURRENT snapshot = replay all commits in version order: the live
file set is (all adds) − (all removes); the schema is the last
``meta``. Everything readers need is in the log — no directory
listing races, no eventually-consistent file discovery; at cluster
scale this is why every lakehouse format replaced "list the
directory" with "read the log".

Concurrency: a commit is the CREATE of the next version file with
O_EXCL (open mode ``x``) — exactly one writer wins a version;
losers get :class:`CommitConflictError` and retry on a fresh
snapshot (optimistic concurrency, the Delta protocol's put-if-absent
primitive; on S3-like stores this maps to a conditional put / DynamoDB
mutex, same contract).

Write path: data files are produced by Spark (``df.write.parquet``
into a staging dir), then registered in the log with per-file
row counts and min/max column stats read from the parquet FOOTERS
(driver-side metadata only, no data scan). MERGE prunes the rewrite
set with those stats — only files whose [min,max] key range
intersects the update keys are rewritten (copy-on-write), the
Delta/Iceberg MERGE shape: touched-file rewrite, not table rewrite.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflictError(RuntimeError):
    """Another writer committed this version first — reload the
    snapshot and retry the transaction."""


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_txlog")


def _version_file(table_path: str, v: int) -> str:
    return os.path.join(_log_dir(table_path), f"{v:08d}.json")


def _file_stats(path: str, stat_cols: list[str]) -> tuple[int, dict]:
    """(row count, {col: [min, max]}) from the parquet footer only."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    rows = pf.metadata.num_rows
    stats: dict[str, list] = {}
    idx = {pf.schema_arrow.field(i).name: i for i in range(len(pf.schema_arrow.names))}
    for c in stat_cols:
        if c not in idx:
            continue
        lo, hi = None, None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if isinstance(lo, bytes):
            # BYTE_ARRAY stats surface as bytes; the log is JSON
            try:
                lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
            except UnicodeDecodeError:
                lo = None  # binary payload column: no usable stats
        if lo is not None:
            try:
                json.dumps([lo, hi])
            except TypeError:
                continue  # non-JSON-serializable stat type: skip
            stats[c] = [lo, hi]
    return rows, stats


class TxTable:
    """A parquet table governed by the transaction log.

    All mutating methods stage data files first and commit the log
    entry LAST — a crashed writer leaves orphan data files (cleaned
    by vacuum) but never a torn table: readers only see files the
    log names.
    """

    def __init__(self, spark: SparkSession, path: str, stat_cols: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.stat_cols = list(stat_cols or [])

    # ---------------- log primitives ----------------

    def version(self) -> int:
        """Latest committed version, -1 if the table does not exist."""
        files = glob.glob(os.path.join(_log_dir(self.path), "*.json"))
        return max((int(os.path.basename(f)[:8]) for f in files), default=-1)

    def _commit(self, actions: list[dict], expected_version: int) -> int:
        """Atomically write version ``expected_version + 1``. O_EXCL
        create: exactly one writer wins; a loser raises
        CommitConflictError without touching the log."""
        v = expected_version + 1
        os.makedirs(_log_dir(self.path), exist_ok=True)
        target = _version_file(self.path, v)
        try:
            with open(target, "x") as fh:
                json.dump(actions, fh)
        except FileExistsError as exc:
            raise CommitConflictError(
                f"version {v} already committed by another writer"
            ) from exc
        return v

    def _replay(self, as_of: int | None = None) -> tuple[list[str], str | None]:
        """(live relative file paths in add order, last schema DDL)."""
        live: dict[str, bool] = {}
        schema = None
        top = self.version()
        if top < 0:
            raise FileNotFoundError(f"no transaction log at {self.path}")
        hi = top if as_of is None else as_of
        for v in range(hi + 1):
            f = _version_file(self.path, v)
            if not os.path.exists(f):
                raise FileNotFoundError(f"missing log version {v} at {self.path}")
            for action in json.load(open(f)):
                if "add" in action:
                    live[action["add"]["path"]] = True
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "meta" in action:
                    schema = action["meta"]["schema"]
        return [p for p in live], schema

    # ---------------- write path ----------------

    def _stage(self, df: DataFrame) -> list[dict]:
        """Write ``df``'s partitions as parquet into a fresh staging
        subdir and return their add actions (footer stats only)."""
        stage = os.path.join(self.path, f"data-{uuid.uuid4().hex[:12]}")
        df.write.mode("errorifexists").parquet(stage)
        adds = []
        for f in sorted(glob.glob(os.path.join(stage, "*.parquet"))):
            rows, stats = _file_stats(f, self.stat_cols)
            rel = os.path.relpath(f, self.path)
            adds.append({"add": {"path": rel, "rows": rows, "stats": stats}})
        return adds

    def create(self, df: DataFrame) -> int:
        """Version 0: data files + schema meta in one commit."""
        if self.version() >= 0:
            raise FileExistsError(f"table already exists at {self.path}")
        os.makedirs(self.path, exist_ok=True)
        actions = self._stage(df)
        actions.append({"meta": {"schema": df.schema.json()}})
        return self._commit(actions, -1)

    def append(self, df: DataFrame) -> int:
        """Blind append — add actions only, no reads rewritten, no
        conflict with concurrent appends beyond the version race."""
        base = self.version()
        return self._commit(self._stage(df), base)

    def committed_txns(self, app_id: str) -> set[int]:
        """Batch ids already committed by ``app_id`` (txn actions)."""
        out = set()
        for v in range(self.version() + 1):
            for action in json.load(open(_version_file(self.path, v))):
                if "txn" in action and action["txn"]["appId"] == app_id:
                    out.add(action["txn"]["batchId"])
        return out

    def append_batch(self, df: DataFrame, app_id: str, batch_id: int) -> int | None:
        """Idempotent append for streaming ``foreachBatch`` sinks —
        the exactly-once protocol every lakehouse sink uses over an
        at-least-once engine: the commit carries a ``txn`` action
        ``(appId, batchId)``; a replayed batch (failure/restart
        reprocessing, speculative re-run) finds its marker in the log
        and becomes a no-op instead of duplicating rows. Data is
        staged BEFORE the txn check narrows the race to the commit
        itself, where the version O_EXCL arbitrates: a conflict loser
        re-reads the log, sees its own marker if the winner was its
        twin, and drops out. Returns the committed version, or None
        for a skipped duplicate."""
        if batch_id in self.committed_txns(app_id):
            return None
        actions = self._stage(df)
        actions.append({"txn": {"appId": app_id, "batchId": batch_id}})
        while True:
            base = self.version()
            if batch_id in self.committed_txns(app_id):
                return None  # twin won the race; staged files are vacuum-able orphans
            try:
                return self._commit(actions, base)
            except CommitConflictError:
                continue

    def foreach_batch_writer(self, app_id: str):
        """``writeStream.foreachBatch(t.foreach_batch_writer("job"))``
        — binds append_batch as the sink function."""

        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.append_batch(batch_df, app_id, batch_id)

        return write

    def evolve_schema(self, df: DataFrame) -> int:
        """Append a batch whose schema is a SUPERSET (or subset) of
        the table's: the commit records the UNION schema in a meta
        action; readers null-fill missing columns (mergeSchema)."""
        base = self.version()
        actions = self._stage(df)
        _, old_schema = self._replay()
        merged = self.snapshot_schema_union(old_schema, df)
        actions.append({"meta": {"schema": merged}})
        return self._commit(actions, base)

    @staticmethod
    def snapshot_schema_union(old_json: str | None, df: DataFrame) -> str:
        import json as _json

        from pyspark.sql.types import StructType

        new = df.schema
        if not old_json:
            return new.json()
        old = StructType.fromJson(_json.loads(old_json))
        fields = {f.name: f for f in old.fields}
        for f in new.fields:
            fields.setdefault(f.name, f)
        return StructType(list(fields.values())).json()

    # ---------------- read path ----------------

    def files(self, as_of: int | None = None) -> list[str]:
        rel, _ = self._replay(as_of)
        return [os.path.join(self.path, p) for p in rel]

    def snapshot(self, as_of: int | None = None) -> DataFrame:
        """DataFrame over exactly the log's live files (time travel
        via ``as_of``). mergeSchema covers evolved generations —
        every file's columns surface, missing ones null-fill."""
        files = self.files(as_of)
        if not files:
            # empty table: zero-row frame with the committed schema
            _, schema = self._replay(as_of)
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame([], StructType.fromJson(json.loads(schema)))
        return self.spark.read.option("mergeSchema", "true").parquet(*files)

    def pruned_files(self, col: str, keys_min, keys_max, as_of: int | None = None) -> tuple[list[str], list[str]]:
        """(files whose [min,max] stats for ``col`` intersect
        [keys_min, keys_max], files that provably cannot) — the
        data-skipping primitive MERGE uses. A file without stats for
        ``col`` is conservatively IN."""
        rel, _ = self._replay(as_of)
        hit, miss = [], []
        stats_by_path: dict[str, dict] = {}
        for v in range(self.version() + 1):
            for action in json.load(open(_version_file(self.path, v))):
                if "add" in action:
                    stats_by_path[action["add"]["path"]] = action["add"].get("stats", {})
        for p in rel:
            st = stats_by_path.get(p, {}).get(col)
            if st is None or (st[0] <= keys_max and keys_min <= st[1]):
                hit.append(os.path.join(self.path, p))
            else:
                miss.append(os.path.join(self.path, p))
        return hit, miss

    # ---------------- transactions ----------------

    def merge_upsert(self, updates: DataFrame, key: str) -> int:
        """Copy-on-write MERGE (SCD1): rows of ``updates`` replace
        same-key rows, new keys append. Only files whose key-range
        stats intersect the update keys are rewritten; untouched
        files keep their add entries — the Delta/Iceberg MERGE shape.
        At cluster scale the rewrite join shuffles only (touched
        files ∪ updates) on the key."""
        base = self.version()
        bounds = updates.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        if bounds.lo is None:  # empty update batch: no-op commit
            return base
        touched, _ = self.pruned_files(key, bounds.lo, bounds.hi)
        actions: list[dict] = []
        if touched:
            current = self.spark.read.option("mergeSchema", "true").parquet(*touched)
            keep = current.join(updates.select(key).distinct(), key, "left_anti")
            rewritten = keep.unionByName(updates, allowMissingColumns=True)
        else:
            rewritten = updates
        actions.extend(self._stage(rewritten))
        for f in touched:
            actions.append({"remove": {"path": os.path.relpath(f, self.path)}})
        return self._commit(actions, base)

    def compact(self, target_files: int = 1, layout_key: str | None = None) -> int:
        """OPTIMIZE: rewrite the live file set into ``target_files``
        parquet files — remove+add in ONE commit, so readers flip
        atomically from the fragmented layout to the compacted one.
        Content-lossless by construction (pure read-rewrite).

        With ``layout_key`` the rewrite range-clusters on that column
        (``repartitionByRange`` + in-partition sort — the OPTIMIZE
        ZORDER shape for one dimension; pass a precomputed Morton key
        column for multi-dimensional clustering): each output file
        covers a disjoint key range, so the footer min/max stats stay
        selective and ``pruned_files``/MERGE skip files after
        compaction instead of degrading to scan-everything. Plain
        ``coalesce`` otherwise (no shuffle)."""
        base = self.version()
        files = self.files()
        if len(files) <= target_files and layout_key is None:
            return base
        df = self.spark.read.option("mergeSchema", "true").parquet(*files)
        if layout_key is not None:
            out = df.repartitionByRange(target_files, layout_key).sortWithinPartitions(
                layout_key
            )
        else:
            out = df.coalesce(target_files)
        actions = self._stage(out)
        for f in files:
            actions.append({"remove": {"path": os.path.relpath(f, self.path)}})
        return self._commit(actions, base)

    def vacuum(self) -> int:
        """Delete data files no commit references anymore (removed or
        orphaned by crashed writers). Returns the number deleted.
        Safe ONLY when no reader needs time travel past the removes —
        the same contract as Delta's VACUUM retention window."""
        live = set(self.files())
        deleted = 0
        for f in glob.glob(os.path.join(self.path, "data-*", "*.parquet")):
            if f not in live:
                os.remove(f)
                deleted += 1
        for d in glob.glob(os.path.join(self.path, "data-*")):
            if not os.listdir(d):
                shutil.rmtree(d)
        return deleted
