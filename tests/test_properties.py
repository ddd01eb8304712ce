"""Property-based invariants (hypothesis) for the binned-aggregation
core — SURVEY.md §5's property test plan.

Spark jobs per example are expensive; examples are capped and sized
small, but the domains are adversarial (bin edges, denormal-adjacent
steps, even/odd group sizes).
"""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.binned_agg import BinSpec, binned_agg

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

from hz_csv2parquet_spark.scratch import scratch_dir
def _events_fixture_dir(spark, rows) -> str:
    """Write ``rows`` of ``(event_id, ms, user_id, event_type,
    value)`` as a production-shaped events fixture (unique tmp dir,
    native timestamp encoding) so a property test can drive the REAL
    catalog query body — table read, reader probe, and all — instead
    of re-implementing its plan inline (the skyline lesson,
    ADVICE r5)."""
    import glob
    import shutil
    import tempfile

    # drop previous examples' dirs (serial tests; bounds /tmp growth)
    for old in glob.glob(f"{tempfile.gettempdir()}/hz_prop_events_*"):
        shutil.rmtree(old, ignore_errors=True)
    d = scratch_dir("hz_prop_events_")
    df = spark.createDataFrame(
        [(e, m, u, t, v, None) for (e, m, u, t, v) in rows],
        "event_id long, ms long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_millis("ms").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@given(
    xs=st.lists(st.floats(min_value=0.0, max_value=99.999, allow_nan=False), min_size=1, max_size=40),
    step=st.sampled_from([0.5, 1.0, 2.5, 10.0]),
)
@SET
def test_every_inrange_point_lands_in_exactly_one_bin(spark, xs, step):
    df = spark.createDataFrame([(x, 1.0) for x in xs], "x double, v double")
    spec = BinSpec("x", 0.0, 100.0, step)
    out = binned_agg(df, [spec], "v", mode="count").collect()
    # total count preserved (no point dropped or double-counted)
    assert sum(r.v_count for r in out) == len(xs)
    # every emitted center is a valid grid center within the range
    n_bins = math.ceil(100.0 / step)
    for r in out:
        i = round((r.x_bin - 0.0) / step - 0.5)
        assert 0 <= i < n_bins
        assert r.x_bin == pytest.approx((i + 0.5) * step, abs=1e-9)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30
    )
)
@SET
def test_median_matches_statistics_median(spark, vals):
    df = spark.createDataFrame([(0.0, v) for v in vals], "x double, v double")
    out = binned_agg(df, [BinSpec("x", 0.0, 1.0, 1.0)], "v", mode="median").collect()
    assert len(out) == 1
    assert out[0].v_median == pytest.approx(statistics.median(vals), rel=1e-12, abs=1e-9)


@given(
    a=st.lists(st.tuples(st.floats(0, 9.99), st.floats(-100, 100)), min_size=1, max_size=20),
    b=st.lists(st.tuples(st.floats(0, 9.99), st.floats(-100, 100)), min_size=1, max_size=20),
)
@SET
def test_collate_equals_aggregate_of_union(spark, a, b):
    """agg.py's two modes: aggregating the union of files must equal
    aggregating the concatenation (global bins make collate
    associative) — the property that justifies multi-path reads."""
    mk = lambda rows: spark.createDataFrame(rows, "x double, v double")
    spec = [BinSpec("x", 0.0, 10.0, 2.0)]
    union = mk(a).unionByName(mk(b))
    together = {r.x_bin: r.v_count for r in binned_agg(union, spec, "v", mode="count").collect()}
    concat = {r.x_bin: r.v_count for r in binned_agg(mk(a + b), spec, "v", mode="count").collect()}
    assert together == concat


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True),
    rate=st.sampled_from([0.0, 0.2, 0.5, 0.8, 1.0]),
    seed=st.integers(min_value=0, max_value=5),
)
@SET
def test_sample_is_pure_function_of_id_rate_seed(spark, ids, rate, seed):
    from hz_csv2parquet_spark.operators.sampling import deterministic_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    kept = {r.doc_id for r in deterministic_sample(df, "doc_id", rate, seed=seed).collect()}
    # monotone in rate: anything kept at r is kept at every r' > r
    if rate < 1.0:
        wider = {
            r.doc_id
            for r in deterministic_sample(df, "doc_id", min(rate + 0.2, 1.0), seed=seed).collect()
        }
        assert kept <= wider
    if rate == 1.0:
        assert kept == set(ids)
    if rate == 0.0:
        assert kept == set()


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40),
    budget=st.sampled_from([100, 250, 1000]),
)
@SET
def test_pack_invariants(spark, sizes, budget):
    from hz_csv2parquet_spark.operators.packing import pack_assignment

    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id bigint, sz bigint")
    out = sorted(
        pack_assignment(df, "sz", budget, order_cols=["doc_id"]).collect(),
        key=lambda r: r.doc_id,
    )
    # pack ids are nondecreasing in stream order and start at 0
    assert out[0].pack_id == 0 and out[0].pack_offset == 0
    for a, b in zip(out, out[1:]):
        assert b.pack_id >= a.pack_id
    # offset is the running size mod budget; pack_id the running size div
    run = 0
    for r in out:
        assert r.pack_id == run // budget and r.pack_offset == run % budget
        run += r.sz


# ---------------------------------------------------------------------
# independent-implementation properties: the DuckDB oracles mirror the
# Spark construction (shared-bug risk); these check operators against
# brute-force Python reimplementations on random inputs instead.
# ---------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=0, max_size=25
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_match_union_find(spark, edges):
    from hz_csv2parquet_spark.operators.graph import connected_components

    verts = list(range(15))
    parent = list(range(15))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # expected label = min vertex id in each union-find component
    comp_min = {}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in verts}

    vdf = spark.createDataFrame([(v,) for v in verts], "v long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = {
        r.v: r.lbl for r in connected_components(vdf, edf, max_iter=20).collect()
    }
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200_000)),
        min_size=0,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_banded_range_join_matches_bruteforce(spark, events):
    from hz_csv2parquet_spark.operators.rangejoin import banded_interval_self_join

    gap = 60_000
    rows = [(uid, ms, i) for i, (uid, ms) in enumerate(events)]
    expected = set()
    for ua, ta, ia in rows:
        for ub, tb, ib in rows:
            if ua == ub and 0 <= tb - ta <= gap and (ta, ia) < (tb, ib):
                expected.add((ia, ib))
    df = spark.createDataFrame(
        [(u, t, i, "x") for u, t, i in rows] or [(0, 0, 0, "x")],
        "user_id long, __ms long, event_id long, event_type string",
    )
    pairs = banded_interval_self_join(df, "user_id", "__ms", "event_id", gap)
    got = {(r.event_id_a, r.event_id_b) for r in pairs.collect()}
    if not rows:
        return  # placeholder row only
    assert got == expected


@given(
    facts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=15
    ),
    dims=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=15
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_bruteforce(spark, facts, dims):
    """asof_join vs brute force: for every fact row, the payload of
    the latest dim row (per key) with dt <= t, ties on dt broken the
    same way both sides (unique dts per key enforced by construction)."""
    from hz_csv2parquet_spark.operators.asof import asof_join

    # one dim per (key, dt) so 'latest prior' is unambiguous
    dimmap = {}
    for k, dt in dims:
        dimmap[(k, dt)] = f"v{k}@{dt}"
    drows = [(k, dt, v) for (k, dt), v in dimmap.items()]
    frows = [(k, t, f"f{i}") for i, (k, t) in enumerate(facts)]

    def brute(k, t):
        cands = [(dt, v) for (kk, dt, v) in drows if kk == k and dt <= t]
        return max(cands)[1] if cands else None

    fdf = spark.createDataFrame(frows, "k long, t long, fid string")
    ddf = spark.createDataFrame(drows or [(99, 0, "x")], "k long, dt long, v string")
    out = {r.fid: r.v for r in asof_join(fdf, ddf, "k", "t", "dt", ["v"]).collect()}
    for k, t, fid in frows:
        assert out[fid] == brute(k, t), (fid, k, t)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),                       # user
            st.integers(0, 5 * 3_600_000),           # ts ms (0..5h)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_funnel_matches_bruteforce(spark, events):
    """funnel_conversion_events' first-touch semantics vs a direct
    Python reimplementation on random event sets."""
    import datetime

    from hz_csv2parquet_spark.queries import FUNNEL_STEP_MS, REGISTRY
    import pyspark.sql.functions as F

    B = 1_700_000_000_000  # clear of the epoch
    rows = [
        (i, datetime.datetime.utcfromtimestamp((B + ms) / 1000.0), u, t, 1.0, "{}")
        for i, (u, ms, t) in enumerate(events)
    ]

    # brute force first-touch funnel
    by_user = {}
    for _, ts, u, t, _v, _p in rows:
        by_user.setdefault(u, []).append((ts, t))
    n_view = n_click = n_purch = 0
    for u, evs in by_user.items():
        views = [ts for ts, t in evs if t == "view"]
        if not views:
            continue
        n_view += 1
        fv = min(views)
        clicks = [ts for ts, t in evs if t == "click" and ts >= fv]
        if not clicks:
            continue
        fc = min(clicks)
        if (fc - fv).total_seconds() * 1000 > FUNNEL_STEP_MS:
            continue
        n_click += 1
        purch = [ts for ts, t in evs if t == "purchase" and ts >= fc]
        if not purch:
            continue
        fp = min(purch)
        if (fp - fc).total_seconds() * 1000 <= FUNNEL_STEP_MS:
            n_purch += 1

    d = scratch_dir("hz_prop_tmp_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r.step: r.n_users
        for r in REGISTRY["funnel_conversion_events"].fn(spark, d).collect()
    }
    assert got == {"view": n_view, "click_1h": n_click, "purchase_1h": n_purch}


def _write_events_native(spark, rows):
    """rows: (event_id, ts_ms, user_id, event_type) → a temp dir laid
    out like an sf_dir with a native-timestamp events.parquet."""
    import datetime
    d = scratch_dir("hz_prop_tmp_")
    spark.createDataFrame(
        [
            (i, datetime.datetime.utcfromtimestamp(ms / 1000.0), u, t, 1.0, "{}")
            for i, ms, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@given(
    events=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30 * 24 * 3_600_000)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_retention_matches_bruteforce(spark, events):
    from hz_csv2parquet_spark.queries import REGISTRY

    B = 1_700_000_000_000
    WEEK = 7 * 24 * 3_600_000
    rows = [(i, B + ms, u, "x") for i, (u, ms) in enumerate(events)]
    weeks = {(u, (B + ms) // WEEK) for i, (u, ms) in enumerate(events)}
    cohort = {}
    for u, w in weeks:
        cohort[u] = min(cohort.get(u, w), w)
    expected = {}
    for u, w in weeks:
        key = (cohort[u], w - cohort[u])
        expected[key] = expected.get(key, 0) + 1

    d = _write_events_native(spark, rows)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in REGISTRY["retention_cohorts_events"].fn(spark, d).collect()
    }
    assert got == expected


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 1_000_000),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda e: (e[0], e[1]),
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_path_trigrams_match_bruteforce(spark, events):
    from hz_csv2parquet_spark.queries import REGISTRY

    B = 1_700_000_000_000
    rows = [(i, B + ms, u, t) for i, (u, ms, t) in enumerate(events)]
    by_user = {}
    for i, ts, u, t in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(u, []).append(t)
    counts = {}
    for seq in by_user.values():
        for j in range(len(seq) - 2):
            p = ">".join(seq[j : j + 3])
            counts[p] = counts.get(p, 0) + 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    d = _write_events_native(spark, rows)
    got = [
        (r.path, r.n)
        for r in REGISTRY["event_path_trigrams"].fn(spark, d).collect()
    ]
    assert got == expected


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 100 * 3_600_000),
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_gap_fill_matches_bruteforce(spark, events):
    from hz_csv2parquet_spark.queries import REGISTRY

    B = 1_700_000_000_000
    H = 3_600_000
    rows = [(i, B + ms, u, t) for i, (u, ms, t) in enumerate(events)]
    counts = {}
    for _, tsms, _, t in rows:
        counts[(t, tsms // H)] = counts.get((t, tsms // H), 0) + 1
    expected = {}
    for t in {t for t, _ in counts}:
        hours = [h for tt, h in counts if tt == t]
        for h in range(min(hours), max(hours) + 1):
            expected[(t, h)] = counts.get((t, h), 0)

    d = _write_events_native(spark, rows)
    got = {
        (r.event_type, r.hour_bucket): r.n_events
        for r in REGISTRY["gap_fill_hourly_events"].fn(spark, d).collect()
    }
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 50 * 3_600_000), st.integers(-500, 500)),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_trend_slope_matches_bruteforce(spark, events):
    """Closed-form OLS slope on exact integer moments vs a direct
    fraction computation in Python big-ints (no float drift)."""
    import datetime
    from fractions import Fraction

    from hz_csv2parquet_spark.queries import REGISTRY

    B = 1_700_000_000_000
    rows = [
        (i, datetime.datetime.utcfromtimestamp((B + ms) / 1000.0), u, "x", cents / 100.0, "{}")
        for i, (u, ms, cents) in enumerate(events)
    ]
    xs = [(B + ms) // 3_600_000 for _, ms, _ in events]
    ys = [cents for _, _, cents in events]
    n = len(events)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den == 0:
        return  # all events in one hour for the single type — no slope
    expected = float(Fraction(n * sxy - sx * sy, den) / 100)

    d = scratch_dir("hz_prop_tmp_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.event_type: r for r in REGISTRY["trend_slope_by_type"].fn(spark, d).collect()}
    assert out["x"].n == n
    assert abs(out["x"].slope_per_hour - expected) < 1e-9


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bm25_matches_bruteforce(spark, docs):
    """bm25_topk vs a pure-python BM25 with the same rational idf:
    identical score set and identical (score, id)-ordered ranking."""
    from hz_csv2parquet_spark.operators.ir import BM25_B, BM25_K1, bm25_topk

    terms = ["a", "b"]
    texts = [" ".join(d) for d in docs]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df_t = {t: sum(1 for d in docs if t in d) for t in terms}

    def brute(d):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if not tf or not df_t[t]:
                continue
            idf = (n - df_t[t] + 0.5) / (df_t[t] + 0.5)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(d) / avgdl))
            )
        return s

    expected = sorted(
        ((brute(d), i) for i, d in enumerate(docs) if brute(d) > 0),
        key=lambda p: (-p[0], p[1]),
    )[:5]
    sdf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [(r.score, r.doc_id) for r in bm25_topk(sdf, "doc_id", "text", terms, k=5).collect()]
    assert [i for _, i in got] == [i for _, i in expected]
    for (gs, _), (es, _) in zip(got, expected):
        # the operator quantizes per-term contributions at 1e-10
        # (decimal routing) — compare absolutely, not relatively
        assert gs == pytest.approx(es, abs=1e-8)


def test_bm25_null_doc_id_matches_oracle_join_semantics(spark):
    """Advisor r15: the oracle's ``tf JOIN dl USING (doc_id)`` drops
    NULL-id rows from the scored output while its ``COUNT(*)`` corpus
    stats still count them. The linearized operator (no doc-grain
    join since r15) must reproduce exactly that split."""
    from hz_csv2parquet_spark.operators.ir import BM25_B, BM25_K1, bm25_topk

    rows = [(0, "a a b"), (1, "b c"), (None, "a a a a")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in bm25_topk(sdf, "doc_id", "text", ["a", "b"], k=5).collect()
    }
    assert None not in got and set(got) == {0, 1}
    # oracle arithmetic: n_docs=3 and avgdl include the NULL-id doc;
    # df counts only non-null docs (COUNT(DISTINCT doc_id))
    n, avgdl = 3, (3 + 2 + 4) / 3
    df_t = {"a": 1, "b": 2}

    def brute(toks):
        s = 0.0
        for t in ("a", "b"):
            tf = toks.count(t)
            if not tf:
                continue
            idf = (n - df_t[t] + 0.5) / (df_t[t] + 0.5)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(toks) / avgdl))
            )
        return s

    assert got[0] == pytest.approx(brute(["a", "a", "b"]), abs=1e-8)
    assert got[1] == pytest.approx(brute(["b", "c"]), abs=1e-8)


def test_bm25_two_frames_compose_with_distinct_memo_slots(spark):
    """Advisor r15: two bm25_topk frames in one job share the global
    single-slot memo — with distinct slots the earlier frame's cached
    base survives the later build and both score correctly."""
    from hz_csv2parquet_spark.operators.ir import bm25_topk

    d1 = spark.createDataFrame([(0, "a b"), (1, "b b")], "doc_id long, text string")
    d2 = spark.createDataFrame([(7, "a a")], "doc_id long, text string")
    f1 = bm25_topk(d1, "doc_id", "text", ["b"], k=2, memo_slot="bm25_t1")
    f2 = bm25_topk(d2, "doc_id", "text", ["a"], k=1, memo_slot="bm25_t2")
    both = f1.select("doc_id").unionByName(f2.select("doc_id"))
    assert {r.doc_id for r in both.collect()} == {0, 1, 7}


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1_800_000)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_debounce_lag_gap_matches_bruteforce(spark, events):
    """The PRODUCTION debounce_events query (lag-gap per
    (user, type), 5-min threshold) keeps exactly the rows whose
    predecessor is more than the threshold older — driven through a
    generated events fixture so the real query body runs."""
    from hz_csv2parquet_spark.queries_ir import _DEBOUNCE_MS, debounce_events

    rows = [(i, ms, u, "t", 0.0) for i, (u, ms) in enumerate(events)]
    expected = {}
    for i, ms, u, _t, _v in rows:
        prior = [(m2, i2) for (i2, m2, u2, _, _) in rows if u2 == u and (m2, i2) < (ms, i)]
        if not prior:
            expected[i] = None
        elif ms - max(prior)[0] > _DEBOUNCE_MS:
            expected[i] = ms - max(prior)[0]

    sf_dir = _events_fixture_dir(spark, rows)
    got = {r.event_id: r.gap_ms for r in debounce_events(spark, sf_dir).collect()}
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["x", "y"])),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_event_type_runs_match_runlength(spark, events):
    """Gaps-and-islands run collapse vs a per-user run-length scan."""
    import itertools

    rows = [(u, t, i * 1000, i) for i, (u, t) in enumerate(events)]
    expected = {}
    for u in {r[0] for r in rows}:
        seq = sorted((ms, i, t) for (uu, t, ms, i) in rows if uu == u)
        for t, grp in itertools.groupby(seq, key=lambda x: x[2]):
            g = list(grp)
            if len(g) >= 2:
                expected[(u, t, g[0][0])] = (len(g), g[-1][0])

    from hz_csv2parquet_spark.queries_ir import event_type_runs

    sf_dir = _events_fixture_dir(
        spark, [(i, ms, u, t, 0.0) for (u, t, ms, i) in rows]
    )
    got = {
        (r.user_id, r.event_type, r.start_ms): (r.run_len, r.end_ms)
        for r in event_type_runs(spark, sf_dir).collect()
    }
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 14)),  # (user, day)
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_rolling_7d_fanout_matches_bruteforce(spark, events):
    """The distinct-then-fan-out sliding DISTINCT equals the direct
    per-day '# users active in [day-6, day]' count."""
    observed = sorted({d for _, d in events})
    expected = {
        d: len({u for (u, dd) in events if d - 6 <= dd <= d}) for d in observed
    }
    from hz_csv2parquet_spark.queries_ir import rolling_7d_active_users

    sf_dir = _events_fixture_dir(
        spark,
        [(i, d * 86_400_000, u, "t", 0.0) for i, (u, d) in enumerate(events)],
    )
    got = {
        r.as_of_day: r.active_7d
        for r in rolling_7d_active_users(spark, sf_dir).collect()
    }
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)), min_size=1, max_size=15
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_pagerank_iteration_matches_numpy(spark, edges):
    """Five DataFrame power iterations vs the same recurrence run in
    plain python dicts (weighted edges from duplicate counts)."""
    from collections import Counter

    w = Counter(edges)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outw = Counter()
    for (a, _), c in w.items():
        outw[a] += c
    p = {(a, b): c / outw[a] for (a, b), c in w.items()}
    r = {v: 1.0 for v in nodes}
    for _ in range(5):
        incoming = {v: 0.0 for v in nodes}
        for (a, b), pp in p.items():
            incoming[b] += r[a] * pp
        r = {v: 0.15 + 0.85 * incoming[v] for v in nodes}

    from hz_csv2parquet_spark.functions.exact import exact_sum
    edf = spark.createDataFrame(
        [(a, b, float(c)) for (a, b), c in w.items()], "a long, b long, w double"
    )
    ow = edf.groupBy("a").agg(F.sum("w").alias("ow"))
    pdf = edf.join(ow, "a").select(
        "a", "b", (F.col("w") / F.col("ow")).alias("p")
    )
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    rdf = ndf.select("node", F.lit(1.0).alias("r"))
    for _ in range(5):
        inc = (
            pdf.join(rdf, pdf["a"] == rdf["node"])
            .select(F.col("b").alias("node"), (F.col("r") * F.col("p")).alias("rp"))
            .groupBy("node")
            .agg(exact_sum("rp").alias("s"))
        )
        rdf = ndf.join(inc, "node", "left").select(
            "node",
            (F.lit(0.15) + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))).alias("r"),
        )
    got = {r_.node: r_.r for r_ in rdf.collect()}
    for v in nodes:
        assert got[v] == pytest.approx(r[v], rel=1e-9), v


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=999.99, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_trimmed_mean_rank_gate_matches_sorted_slice(spark, vals):
    """The two-phase-rank trim gate keeps exactly the sorted middle
    slice [floor(n/20), n - floor(n/20))."""
    from hz_csv2parquet_spark.operators.rank import two_phase_rank

    rows = [("t", float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    ranked = two_phase_rank(df, ["g"], "v", ["id"], lo=0.0, hi=1000.0)
    kept = ranked.filter(
        (F.col("rn") > F.floor(F.col("n_part") / 20))
        & (F.col("rn") <= F.col("n_part") - F.floor(F.col("n_part") / 20))
    )
    got = sorted((r.v, r.id) for r in kept.collect())
    srt = sorted((v, i) for (_, v, i) in rows)
    cut = len(vals) // 20
    expected = srt[cut : len(vals) - cut]
    assert got == expected


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_keywords_topk_matches_bruteforce(spark, docs):
    """Per-doc tf·(N/df) top-3 vs pure python (same rational idf,
    same (score desc, token asc) tiebreak)."""
    from pyspark.sql import Window

    n = len(docs)
    df_t = {}
    for d in docs:
        for t in set(d):
            df_t[t] = df_t.get(t, 0) + 1

    def brute(d):
        scored = [
            (d.count(t) * (n / df_t[t]), t) for t in sorted(set(d))
        ]
        return [t for _, t in sorted(scored, key=lambda p: (-p[0], p[1]))[:3]]

    sdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    from hz_csv2parquet_spark.functions.text import tokens as _tokens

    toks = sdf.select("doc_id", F.explode(_tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    nn = sdf.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    got = {}
    for r in top.collect():
        got.setdefault(r.doc_id, []).append((r.rn, r.token))
    for i, d in enumerate(docs):
        assert [t for _, t in sorted(got[i])] == brute(d), (i, d)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 50),
            st.integers(0, 10_000),
            st.integers(-10_000, 10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_skyline_decomposition_matches_bruteforce(spark, pts):
    """The PRODUCTION bucketed-skyline operator (operators/skyline.py,
    the same code skyline_orders runs) must equal the quadratic
    definition on arbitrary point sets, including bucket-boundary
    collisions, duplicate (d, p) pairs across ids, and NEGATIVE p
    values — the domain a -1 'no dominator' sentinel would corrupt
    (ADVICE r6: the operator now uses a NULL threshold). A small
    bucket count over a small domain maximizes boundary coverage."""
    from hz_csv2parquet_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(pts, "o_orderkey long, d long, p long")
    got = {r.o_orderkey for r in skyline_2d(df, "d", "p", 0, 10_001, n_buckets=8).collect()}
    want = {
        k for k, d, p in pts
        if not any(d2 > d and p2 > p for _, d2, p2 in pts)
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 4)),
            st.tuples(st.just("merge"), st.integers(0, 4)),
            st.tuples(st.just("delete"), st.integers(0, 4)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_txlog_random_op_sequences_match_dict_mirror(spark, tmp_path_factory, ops):
    """Lakehouse-layer soundness: an arbitrary interleaving of
    append / stats-pruned MERGE / layout compaction over a TxTable
    must equal a plain per-key dict replay of the same operations —
    including time travel to every intermediate version. Appends use
    unique key ranges; merges target a 10-key band (half updates,
    half inserts), so the sequence exercises file pruning, rewrite,
    and atomic layout flips together."""
    from hz_csv2parquet_spark.sources.txlog import TxTable

    root = tmp_path_factory.mktemp("txprop")
    t = TxTable(spark, str(root / "tbl"), stat_cols=["k"], checkpoint_interval=3)
    t.create(
        spark.range(20).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v")
    )
    mirror = {k: -1 for k in range(20)}
    history = [(0, dict(mirror))]  # (version, state) after each commit
    serial = 0
    for op, arg in ops:
        serial += 1
        if op == "append":
            base = 1000 * serial + 100 * arg
            t.append(
                spark.range(base, base + 5).selectExpr(
                    "id AS k", f"CAST({serial} AS BIGINT) AS v"
                )
            )
            for k in range(base, base + 5):
                mirror[k] = serial
        elif op == "merge":
            lo = 10 * arg
            t.merge_upsert(
                spark.range(lo, lo + 10).selectExpr(
                    "id AS k", f"CAST({100 + serial} AS BIGINT) AS v"
                ),
                "k",
            )
            for k in range(lo, lo + 10):
                mirror[k] = 100 + serial
        elif op == "delete":
            lo = 10 * arg
            if not any(lo <= k < lo + 5 for k in mirror):
                t.delete_where(f"k >= {lo} AND k < {lo + 5}")
                continue  # no-match delete commits no version
            t.delete_where(f"k >= {lo} AND k < {lo + 5}")
            for k in [k for k in mirror if lo <= k < lo + 5]:
                del mirror[k]
        else:
            t.compact(target_files=2, layout_key="k")
        history.append((t.version(), dict(mirror)))
    # final state
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == mirror
    # time travel to every intermediate version matches the replay
    for v, want in history:
        got_v = {r.k: r.v for r in t.snapshot(as_of=v).collect()}
        assert got_v == want, f"version {v}"
    # change-feed soundness (E164): applying each commit's feed to
    # the prior snapshot reproduces the next snapshot as a multiset —
    # inserts add, deletes remove, kept rows never appear; layout
    # compaction (dataChange=false) must feed NOTHING.
    from collections import Counter

    for (v0, _), (v1, _) in zip(history, history[1:]):
        feed = t.changes(v0, v1).collect()
        prev = Counter((r.k, r.v) for r in t.snapshot(as_of=v0).collect())
        ins = Counter((r.k, r.v) for r in feed if r._change_type == "insert")
        dels = Counter((r.k, r.v) for r in feed if r._change_type == "delete")
        assert dels <= prev, f"version {v1}: delete of a row not in the prior snapshot"
        want_next = prev - dels + ins
        got_next = Counter((r.k, r.v) for r in t.snapshot(as_of=v1).collect())
        assert got_next == want_next, f"version {v1}: feed does not reconstruct snapshot"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e8, max_value=1e8, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    parts=st.sampled_from([1, 3, 8]),
)
def test_exact_sum_is_partitioning_invariant(spark, vals, parts):
    """The DECIMAL(38,10)-routed sum (functions/exact.py) must be
    bit-identical under ANY partitioning — the property that lets
    166 oracle hashes survive distributed execution. A plain double
    sum is order-dependent; the decimal path is associative and
    commutative by construction, so 1, 3, and 8 partitions must
    agree to the last bit (and match Python's exact Fraction sum
    after the decimal quantization)."""
    from decimal import ROUND_HALF_UP, Decimal

    from hz_csv2parquet_spark.functions.exact import exact_avg, exact_sum

    results = []
    for p in (1, parts):
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(p)
        row = df.agg(
            exact_sum("v").alias("s"), exact_avg("v").alias("a")
        ).collect()[0]
        results.append((row.s, row.a))
    assert results[0] == results[1]  # bitwise equal across partitionings
    # the quantized ground truth mirrors Spark's cast semantics
    # exactly: double → SHORTEST decimal repr (BigDecimal.valueOf /
    # Python repr, NOT the exact binary expansion — measured 1 ulp
    # apart on 4194304.38556613) → quantize to scale 10 under
    # HALF_UP (Python's default HALF_EVEN diverges on exact ties,
    # which dyadic doubles like 2^-11 DO produce at the 11th digit)
    want = float(
        sum(
            Decimal(repr(v)).quantize(Decimal("1.0000000000"), rounding=ROUND_HALF_UP)
            for v in vals
        )
    )
    assert results[0][0] == want


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 3)),
            st.tuples(st.just("merge"), st.integers(0, 3)),
            st.tuples(st.just("delete"), st.integers(0, 3)),
            st.tuples(st.just("update"), st.integers(0, 3)),
            st.tuples(st.just("restore"), st.just(0)),
            st.tuples(st.just("compact"), st.just(0)),
            st.tuples(st.just("rename"), st.just(0)),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_txlog_full_featured_table_matches_dict_mirror(spark, tmp_path_factory, ops):
    """The round-10/11 feature stack composed: a HIVE-PARTITIONED
    table with DELETION VECTORS and CHANGE-DATA sidecars under
    arbitrary append / merge / merge-on-read delete / merge-on-read
    UPDATE / RESTORE / compaction / RENAME-COLUMN interleavings must
    equal the per-key dict replay — including time travel to every
    version (under that version's logical names) and
    feed-reconstructs-snapshot over cdc sidecars (merges as
    delete+insert, UPDATEs as update_preimage/update_postimage, dv
    deletes as exact rows, restores as the inverse of what they undo,
    compaction silent, renames metadata-only: the value column
    toggles v<->w and every verb keeps working through the map)."""
    from collections import Counter

    from hz_csv2parquet_spark.sources.txlog import TxTable

    root = tmp_path_factory.mktemp("txprop_full")
    t = TxTable(
        spark,
        str(root / "tbl"),
        stat_cols=["k"],
        checkpoint_interval=3,
        change_data=True,
        deletion_vectors=True,
    )
    t.create(
        spark.range(20).selectExpr(
            "id AS k", "CAST(id % 3 AS INT) AS p", "CAST(-1 AS BIGINT) AS v"
        ),
        partition_by=["p"],
    )
    mirror = {k: (k % 3, -1) for k in range(20)}
    vname = "v"  # current logical name of the value column
    history = [(0, dict(mirror), vname)]
    serial = 0
    for op, arg in ops:
        serial += 1
        if op == "append":
            base = 1000 * serial + 100 * arg
            t.append(
                spark.range(base, base + 5).selectExpr(
                    "id AS k", "CAST(id % 3 AS INT) AS p",
                    f"CAST({serial} AS BIGINT) AS {vname}",
                )
            )
            for k in range(base, base + 5):
                mirror[k] = (k % 3, serial)
        elif op == "merge":
            lo = 10 * arg
            t.merge_upsert(
                spark.range(lo, lo + 10).selectExpr(
                    "id AS k", "CAST(id % 3 AS INT) AS p",
                    f"CAST({100 + serial} AS BIGINT) AS {vname}",
                ),
                "k",
            )
            for k in range(lo, lo + 10):
                mirror[k] = (k % 3, 100 + serial)
        elif op == "delete":
            lo = 10 * arg
            victims = [k for k in mirror if lo <= k < lo + 5]
            t.delete_where(f"k >= {lo} AND k < {lo + 5}")
            if not victims:
                continue  # no-match delete commits no version
            for k in victims:
                del mirror[k]
        elif op == "update":
            lo = 10 * arg
            hits = [k for k in mirror if lo <= k < lo + 5]
            before = t.version()
            t.update_where(
                f"k >= {lo} AND k < {lo + 5}", {vname: str(500 + serial)}
            )
            if t.version() == before:
                continue  # no-match update commits no version
            for k in hits:
                mirror[k] = (mirror[k][0], 500 + serial)
        elif op == "restore":
            tgt_v, tgt_state, tgt_name = history[len(history) // 2]
            before = t.version()
            t.restore(tgt_v)
            if t.version() == before:
                continue  # restoring the identical state commits nothing
            mirror = dict(tgt_state)
            vname = tgt_name  # the rollback restores the logical names too
        elif op == "rename":
            new = "w" if vname == "v" else "v"
            t.rename_column(vname, new)
            vname = new  # metadata-only: mirror values unchanged
        else:
            t.compact(target_files=2, layout_key="k")
        history.append((t.version(), dict(mirror), vname))

    def rows(df, name):
        return {r.k: (r.p, getattr(r, name)) for r in df.collect()}

    assert rows(t.snapshot(), vname) == mirror
    for v, want, name in history:
        assert rows(t.snapshot(as_of=v), name) == want, f"version {v}"
    for (v0, _, n0), (v1, _, n1) in zip(history, history[1:]):
        # the feed presents the RANGE HEAD's logical names (n1)
        feed = t.changes(v0, v1).collect()
        prev = Counter(
            (r.k, r.p, getattr(r, n1))
            for r in t.snapshot(as_of=v0).withColumnsRenamed({n0: n1}).collect()
        )
        ins = Counter(
            (r.k, r.p, getattr(r, n1))
            for r in feed
            if r._change_type in ("insert", "update_postimage")
        )
        dels = Counter(
            (r.k, r.p, getattr(r, n1))
            for r in feed
            if r._change_type in ("delete", "update_preimage")
        )
        assert dels <= prev, f"version {v1}: delete of a row not in prior snapshot"
        assert prev - dels + ins == Counter(
            (r.k, r.p, getattr(r, n1))
            for r in t.snapshot(as_of=v1).collect()
        ), f"version {v1}: feed does not reconstruct snapshot"
