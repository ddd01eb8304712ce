"""The driver's correctness gate verifies only a capped prefix (50)
of the ``queries()`` dict. These tests pin the rotation discipline
mechanically, driven by the committed CORRECTNESS_r*.json history:

1. every query red / hash-failed in the LATEST round is re-verified,
2. nothing goes more than 2 rounds without a fresh driver row,
3. the explicit ROTATION set fits (with its window) inside the cap,
4. the reordering is a permutation with a clean priority prefix.

When a new round's CORRECTNESS file lands, (1) and (2) recompute —
a stale ROTATION set fails HERE, before the driver wastes a round."""

from __future__ import annotations

import glob
import json
import os

from hz_csv2parquet_spark.queries import (
    REGISTRY,
    ROTATION,
    effective_priority,
    ordered_registry,
)

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history():
    """{query: {round: row}} from every committed CORRECTNESS file."""
    hist: dict[str, dict[int, dict]] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            hist.setdefault(name, {})[r] = row
    return hist


def _window():
    return list(ordered_registry())[:DRIVER_WINDOW]


def test_latest_round_failures_are_rotated_in():
    hist = _history()
    if not hist:
        return
    latest = max(r for rounds in hist.values() for r in rounds)
    window = set(_window())
    failed = {
        name
        for name, rounds in hist.items()
        if latest in rounds
        and name in REGISTRY
        and (
            # crashed queries count as failures too — only the
            # benign rows-only marker is exempt
            rounds[latest].get("err") not in (None, "no_oracle")
            or rounds[latest].get("rows_match") is False
            or rounds[latest].get("hash_match") is False
        )
    }
    missing = failed - window
    assert not missing, f"round-{latest} failures outside driver window: {missing}"


def test_no_query_goes_three_rounds_unverified():
    """Verify-cadence forcing rule. The threshold is 3 rounds (not
    the 2 used through round 5): a K-round rule implies every query
    needs a window slot every K+1 rounds, i.e. |catalog|/(K+1) slots
    per round — at 166 queries K=2 demands 55.3 > the 50-slot
    window (structurally infeasible; rounds 1-5 only passed because
    the catalog was still growing), while K=3 demands 41.5, leaving
    ~8 slots/round of slack for re-verifying failures and changed
    implementations. Never-verified queries tick from their
    registration round (Query.since)."""
    hist = _history()
    if not hist:
        return
    latest = max(r for rounds in hist.values() for r in rounds)
    window = set(_window())
    stale = {
        name
        for name in REGISTRY
        if name in hist and max(hist[name]) <= latest - 3
    } | {
        name
        for name in REGISTRY
        if name not in hist and REGISTRY[name].since <= latest - 3
    }
    missing = stale - window
    assert not missing, (
        f"queries ≥3 rounds unverified but outside the driver window: {missing}"
    )


def test_rotation_set_names_real_queries_and_fits_the_window():
    unknown = ROTATION - set(REGISTRY)
    assert not unknown, f"ROTATION names unknown queries: {unknown}"
    n_priority = sum(1 for q in REGISTRY.values() if effective_priority(q))
    assert n_priority <= DRIVER_WINDOW, (
        f"{n_priority} priority queries exceed the {DRIVER_WINDOW}-row verify cap"
    )
    missing = ROTATION - set(_window())
    assert not missing, f"ROTATION queries outside driver window: {missing}"


def test_catalog_growth_frozen_while_backlog_exceeds_window():
    """VERDICT r5 item 2: 60 never-driver-checked queries is two full
    rounds of window budget — while a backlog persists, new ``@query``
    registrations are capped at the window slack left after the
    backlog is scheduled.

    Backlog = never-driver-checked (the rule's original target) plus
    the rule-MANDATORY stale tail (last row ≤ latest−3). Through
    round 7 this test used "≥2 rounds stale" instead of the mandatory
    tail, which was the right brake while dozens of registrations had
    never been checked; at the round-8 steady state (never-checked =
    0, every query cycling on the ≤3-round cadence) that definition
    counts ~2/3 of a healthy catalog as backlog and would freeze
    growth forever. The cadence-mandatory definition preserves the
    intent — no growth while verification debt exists — without
    penalizing the debt-free steady state (whose real capacity bound
    is test_catalog_size_fits_the_verify_cadence)."""
    hist = _history()
    if not hist:
        return
    latest = max(r for rounds in hist.values() for r in rounds)
    backlog = {
        name
        for name in REGISTRY
        if (name in hist and max(hist[name]) <= latest - 3)
        or (name not in hist and REGISTRY[name].since <= latest)
    }
    slack = max(0, DRIVER_WINDOW - len(backlog))
    new = {name for name in REGISTRY if REGISTRY[name].since > latest}
    assert len(new) <= slack, (
        f"{len(new)} new registrations ({sorted(new)}) but only {slack} window "
        f"slots remain after the {len(backlog)}-query verification backlog — "
        "freeze catalog growth until driver coverage catches up"
    )


def test_hard_staleness_ceiling():
    """VERDICT r5 item 6: no catalog query's latest driver row (or,
    for never-verified queries, registration round) may be more than
    3 rounds old. The 3-round rule above forces age-3 queries INTO
    the window; this one catches the failure mode where a query
    keeps getting deferred round after round and the window never
    actually covers it. Feasible at the steady state: a 50-slot
    window revisits all 166 queries within ⌈166/50⌉ = 4 rounds, so
    round-robin keeps every age ≤ 3 at planning time."""
    hist = _history()
    if not hist:
        return
    latest = max(r for rounds in hist.values() for r in rounds)
    over_ceiling = {
        name
        for name in REGISTRY
        if (name in hist and max(hist[name]) < latest - 3)
        or (name not in hist and REGISTRY[name].since < latest - 3)
    }
    assert not over_ceiling, (
        f"queries >3 rounds without a driver CORRECTNESS row: {over_ceiling}"
    )


def test_catalog_size_fits_the_verify_cadence():
    """Feasibility invariant behind the 3-round rule: a catalog of N
    queries on a 50-slot window needs N/4 ≤ 50 steady-state slots
    (every query revisited within 4 rounds), and real rounds also
    spend slots on failures and changed implementations — keep ≥15%
    slack. At N=166 the demand is 41.5 (17% slack). A catalog that
    grows past ~170 breaks the cadence arithmetic no matter how the
    ROTATION is chosen — shrink the catalog or raise the window
    before registering more queries."""
    demand = len(REGISTRY) / 4
    assert demand <= 0.85 * DRIVER_WINDOW, (
        f"{len(REGISTRY)} queries need {demand:.1f} steady-state verify slots "
        f"per round; the {DRIVER_WINDOW}-row window leaves too little slack"
    )


def test_next_round_window_is_feasible():
    """VERDICT r10 item 7: don't just satisfy THIS round's window —
    simulate the next one. Assume the driver verifies exactly the
    current 50-row window at round latest+1; then round latest+2's
    rule-mandatory set is every query whose last row would be
    ≤ (latest+1) − 3. If that set alone exceeds the window, the
    cadence is already structurally broken one round out (a growth
    spurt or a mis-chosen ROTATION can do this while the current
    round still passes)."""
    hist = _history()
    if not hist:
        return
    latest = max(r for rounds in hist.values() for r in rounds)
    window = set(_window())
    # project each query's last-verified round after the next driver run
    projected = {
        name: (latest + 1 if name in window else max(hist[name]))
        for name in REGISTRY
        if name in hist
    }
    projected.update(
        {
            name: (latest + 1 if name in window else REGISTRY[name].since)
            for name in REGISTRY
            if name not in hist
        }
    )
    next_mandatory = {n for n, r in projected.items() if r <= (latest + 1) - 3}
    assert len(next_mandatory) <= DRIVER_WINDOW, (
        f"round-{latest + 2} would be infeasible: {len(next_mandatory)} "
        f"rule-mandatory queries > {DRIVER_WINDOW}-row window"
    )


def test_ordering_is_a_permutation_of_the_registry():
    assert set(ordered_registry()) == set(REGISTRY)
    assert len(ordered_registry()) == len(REGISTRY)


def test_priority_block_is_a_stable_prefix():
    names = list(ordered_registry())
    flags = [effective_priority(ordered_registry()[n]) for n in names]
    # all priority entries precede all non-priority entries
    assert flags == sorted(flags, reverse=True)
