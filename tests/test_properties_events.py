"""Brute-force property tests for the round-5 time-series catalog
queries ahead of their first driver verification (round-7 window):
each test writes hypothesis-generated rows as a production-shaped
events fixture dir and drives the REAL registered query body, then
checks it against a direct Python mirror. Oracle parity already
covers the fixture distribution; these cover the edges the fixture
can't hit — ties, single-event users, all-null groups, touching
intervals, plateau peaks."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_properties import _events_fixture_dir

SET8 = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))

HOUR_MS = 3_600_000

from hz_csv2parquet_spark.scratch import scratch_dir
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 3 * HOUR_MS),  # ms
            st.booleans(),              # is_click
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),  # unique (user, ms): no asof ties
    )
)
@SET8
def test_asof_tolerance_matches_bruteforce(spark, events):
    from hz_csv2parquet_spark.queries_extra import asof_tolerance_last_click

    rows = [
        (i, ms, u, "click" if c else "view", float(i))
        for i, (u, ms, c) in enumerate(events)
    ]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {
        r.event_id: (r.last_click_id, r.last_click_value, r.age_ms)
        for r in asof_tolerance_last_click(spark, sf_dir).collect()
    }
    clicks = [(u, ms, i, v) for (i, ms, u, t, v) in rows if t == "click"]
    expected = {}
    for i, ms, u, _t, _v in rows:
        cand = [(cms, cid, cv) for (cu, cms, cid, cv) in clicks if cu == u and cms <= ms]
        if cand and ms - max(cand)[0] <= HOUR_MS:
            cms, cid, cv = max(cand)
            expected[i] = (cid, cv, ms - cms)
        else:
            expected[i] = (None, None, None)
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2_000_000)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@SET8
def test_interval_coverage_matches_merge(spark, events):
    from hz_csv2parquet_spark.queries_ir import interval_coverage_users

    W = 300_000
    rows = [(i, ms, u, "t", 0.0) for i, (u, ms) in enumerate(events)]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {
        r.user_id: (r.n_islands, r.covered_ms)
        for r in interval_coverage_users(spark, sf_dir).collect()
    }
    expected = {}
    for u in {r[2] for r in rows}:
        ivs = sorted((ms, ms + W) for (_i, ms, uu, _t, _v) in rows if uu == u)
        islands = []
        for s, e in ivs:
            # production rule: new island iff s > max prior end
            # (touching intervals merge)
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expected[u] = (len(islands), sum(e - s for s, e in islands))
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000_000)),
        min_size=1,
        max_size=20,
    )
)
@SET8
def test_interarrival_stats_match_direct_diffs(spark, events):
    from hz_csv2parquet_spark.queries_ir import interarrival_stats_users

    rows = [(i, ms, u, "t", 0.0) for i, (u, ms) in enumerate(events)]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {
        r.user_id: (r.n_gaps, r.mean_gap_ms, r.cv2)
        for r in interarrival_stats_users(spark, sf_dir).collect()
    }
    expected = {}
    for u in {r[2] for r in rows}:
        ts = [ms for (i, ms, uu, _t, _v) in sorted(
            ((i, ms, uu, t, v) for (i, ms, uu, t, v) in rows if uu == u),
            key=lambda r: (r[1], r[0]),
        )]
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        sg = sum(gaps)
        if gaps and sg > 0:
            sg2 = sum(g * g for g in gaps)
            n = len(gaps)
            expected[u] = (n, sg / n, (n * sg2 - sg * sg) / (sg * sg))
    assert set(got) == set(expected)
    for u in got:
        assert got[u][0] == expected[u][0]
        assert got[u][1] == pytest.approx(expected[u][1], rel=1e-12)
        assert got[u][2] == pytest.approx(expected[u][2], rel=1e-9, abs=1e-12)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 100), st.booleans()),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@SET8
def test_locf_matches_forward_scan(spark, events):
    from hz_csv2parquet_spark.queries_ir import locf_carry_forward_events

    rows = [
        (i, ms, u, "purchase" if p else "view", float(i + 1))
        for i, (u, ms, p) in enumerate(events)
    ]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {
        r.event_id: r.last_purchase_value
        for r in locf_carry_forward_events(spark, sf_dir).collect()
    }
    expected = {}
    for u in {r[2] for r in rows}:
        seq = sorted((r for r in rows if r[2] == u), key=lambda r: (r[1], r[0]))
        carry = None
        for i, _ms, _u, t, v in seq:
            if t == "purchase":
                carry = v
            expected[i] = carry
    assert got == expected


@given(
    counts=st.lists(st.integers(0, 4), min_size=3, max_size=12),
)
@SET8
def test_hourly_peaks_match_local_maxima(spark, counts):
    """counts[h] events in hour h for one type — strict local maxima
    only, plateaus and boundary hours excluded. Hours with zero
    events are ABSENT from the series (the window neighbors are the
    adjacent observed hours, not calendar neighbors) — the brute
    mirror reproduces that."""
    from hz_csv2parquet_spark.queries_ir import hourly_peaks_events

    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, h * HOUR_MS + eid % HOUR_MS, 0, "t", 0.0))
            eid += 1
    if not rows:
        return
    sf_dir = _events_fixture_dir(spark, rows)
    got = {r.hour_bucket: (r.n, r.prev_n, r.next_n) for r in hourly_peaks_events(spark, sf_dir).collect()}
    series = [(h, c) for h, c in enumerate(counts) if c > 0]
    expected = {}
    for j in range(1, len(series) - 1):
        h, n = series[j]
        pn, nn = series[j - 1][1], series[j + 1][1]
        if n > pn and n > nn:
            expected[h] = (n, pn, nn)
    assert got == expected


@given(
    vals=st.lists(
        st.tuples(st.booleans(), st.integers(-50, 50)),
        min_size=1,
        max_size=16,
    )
)
@SET8
def test_impute_group_median_matches_statistics(spark, vals):
    """'error' rows impute their type's exact interpolating median;
    a group that is ALL errors has no median — its sum stays NULL."""
    from hz_csv2parquet_spark.queries_ir import impute_group_median_events

    rows = [
        (i, i * 1000, 0, "error" if e else "a", float(v))
        for i, (e, v) in enumerate(vals)
    ]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {
        r.event_type: (r.n, r.n_imputed, r.value_sum)
        for r in impute_group_median_events(spark, sf_dir).collect()
    }
    a_vals = [v for (_i, _ms, _u, t, v) in rows if t == "a"]
    err_n = sum(1 for r in rows if r[3] == "error")
    expected_types = set()
    if a_vals:
        expected_types.add("a")
        assert got["a"][0] == len(a_vals) and got["a"][1] == 0
        assert got["a"][2] == pytest.approx(sum(a_vals), abs=1e-9)
    if err_n:
        expected_types.add("error")
        n, n_imputed, s = got["error"]
        assert n == err_n and n_imputed == err_n
        assert s is None  # no non-null peer values anywhere in the group
    assert set(got) == expected_types


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-85.0, max_value=5.0, allow_nan=False),
            st.floats(min_value=-155.0, max_value=55.0, allow_nan=False),
        ),
        min_size=0,
        max_size=15,
    )
)
@SET8
def test_geo_radius_grid_join_matches_semantic(spark, pts):
    """The 3x3-cell grid decomposition of the radius join must equal
    the semantic cross-join-with-distance-filter definition —
    including points exactly ON the radius (d = R, kept) and on cell
    boundaries (lat/lon multiples of the 15-degree cell size). Both
    sides compute lat/lon with the same IEEE double expressions, so
    the comparison is exact."""
    import tempfile

    from hz_csv2parquet_spark.queries_io import (
        _GEO_CENTERS,
        _GEO_RADIUS,
        geo_radius_join_lineitem,
    )

    # adversarial plants: exactly-at-radius and exactly-on-cell-edge
    plants = [
        (_GEO_CENTERS[0][0] + _GEO_RADIUS, _GEO_CENTERS[0][1]),  # d == R
        (_GEO_CENTERS[1][0], _GEO_CENTERS[1][1] - _GEO_RADIUS),  # d == R
        (-45.0, -90.0),  # both coords on cell boundaries
        (-30.0, 0.0),
    ]
    lls = list(pts) + plants
    rows = [((lat + 80.0) / 800.0, (lon + 150.0) / 5.0, float(i + 1)) for i, (lat, lon) in enumerate(lls)]

    d = scratch_dir("hz_prop_li_")
    spark.createDataFrame(
        rows, "l_discount double, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    got = {
        r.center_id: (r.n_points, r.revenue)
        for r in geo_radius_join_lineitem(spark, d).collect()
    }
    r2 = _GEO_RADIUS * _GEO_RADIUS
    expected = {}
    for cid, (clat, clon) in enumerate(_GEO_CENTERS):
        hits = []
        for disc, qty, rev in rows:
            lat = disc * 800.0 - 80.0  # same IEEE ops as the query
            lon = qty * 5.0 - 150.0
            if (lat - clat) * (lat - clat) + (lon - clon) * (lon - clon) <= r2:
                hits.append(rev)
        if hits:
            expected[cid] = (len(hits), pytest.approx(sum(hits), abs=1e-9))
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 200_000), st.integers(0, 40 * 365 * 24 * HOUR_MS)),
        min_size=1,
        max_size=15,
    )
)
@SET8
def test_zorder_key_matches_python_interleave(spark, events):
    """The Morton key produced by the production zorder_key_events
    expression equals a direct Python bit interleave, including
    dimension values above the 16-bit wrap (user_id % 65536)."""
    from hz_csv2parquet_spark.queries_ir import zorder_key_events

    rows = [(i, ms, u, "t", 0.0) for i, (u, ms) in enumerate(events)]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {r.event_id: (r.ua, r.hb, r.zkey) for r in zorder_key_events(spark, sf_dir).collect()}

    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for i, ms, u, _t, _v in rows:
        ua, hb = u % 65536, (ms // HOUR_MS) % 65536
        assert got[i] == (ua, hb, interleave(ua, hb))


@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.sampled_from([0.0, 1.0, 1.0, 2.5, 500.0, 999.875, 1000.0]) | st.floats(0, 999.9, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    )
)
@SET8
def test_quantile_normalize_matches_sorted_rank(spark, events):
    """The two-phase histogram rank behind quantile normalization must
    reproduce the plain sorted rank q = (2·rn − 1)/(2n) per type,
    including DUPLICATE values (tie-break on event_id) and domain
    boundary values (0, bucket edges, the hi bound itself)."""
    from hz_csv2parquet_spark.queries_ir import quantile_normalize_events

    rows = [(i, i * 1000, 0, t, float(v)) for i, (t, v) in enumerate(events)]
    sf_dir = _events_fixture_dir(spark, rows)
    got = {r.event_id: (r.event_type, r.q) for r in quantile_normalize_events(spark, sf_dir).collect()}
    expected = {}
    for t in {r[3] for r in rows}:
        grp = sorted(((v, i) for (i, _ms, _u, tt, v) in rows if tt == t))
        n = len(grp)
        for rn, (_v, i) in enumerate(grp, start=1):
            expected[i] = (t, (2.0 * rn - 1.0) / (2.0 * n))
    assert set(got) == set(expected)
    for i in got:
        assert got[i][0] == expected[i][0]
        assert got[i][1] == pytest.approx(expected[i][1], rel=1e-12)


def _orders_fixture_dir(spark, rows) -> str:
    """rows of (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    date_ms, o_orderpriority) written as a minimal orders fixture."""
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    for old in _glob.glob(f"{_tempfile.gettempdir()}/hz_prop_orders_*"):
        _shutil.rmtree(old, ignore_errors=True)
    d = scratch_dir("hz_prop_orders_")
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, date_ms long, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "timestamp_millis(date_ms) AS o_orderdate",
        "o_orderpriority",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return d


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.integers(0, 50),
            st.sampled_from(["O", "F", "P"]),
            st.integers(1, 10_000_00),  # cents, exact as double/100
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@SET8
def test_table_checksum_matches_mirror_and_detects_change(spark, rows):
    """The order-insensitive checksum equals a Python md5 mirror, and
    flipping a single row's price changes it (anti-entropy: a silent
    one-value corruption must not checksum-collide)."""
    import hashlib

    from hz_csv2parquet_spark.queries_tpch2 import checksum_orders_table

    orders = [
        (k, c, s, cents / 100.0, (k % 1000) * 86_400_000, "1-URGENT")
        for (k, c, s, cents) in rows
    ]
    sf_dir = _orders_fixture_dir(spark, orders)
    got = checksum_orders_table(spark, sf_dir).collect()[0]

    def mirror(os_):
        total = 0
        for (k, c, s, price, dms, prio) in os_:
            row = f"{k}|{c}|{s}|{round(price * 100)}|{dms}|{prio}"
            total += int(hashlib.md5(row.encode()).hexdigest()[:8], 16)
        return str(total)

    assert got.n_rows == len(orders)
    assert got.checksum == mirror(orders)

    # corrupt one price by a cent: checksum must move
    k0, c0, s0, p0, d0, pr0 = orders[0]
    corrupted = [(k0, c0, s0, p0 + 0.01, d0, pr0)] + orders[1:]
    sf2 = _orders_fixture_dir(spark, corrupted)
    got2 = checksum_orders_table(spark, sf2).collect()[0]
    assert got2.checksum != got.checksum
