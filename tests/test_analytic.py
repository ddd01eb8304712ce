"""Semantic invariants for the analytic operator family (E70-E88) —
properties the oracle hash can't express directly (monotonicity,
cross-query consistency) pinned on the fixture tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from hz_csv2parquet_spark.queries import REGISTRY


def test_funnel_is_monotone(spark, sf_dir):
    rows = {
        r.step: r.n_users
        for r in REGISTRY["funnel_conversion_events"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"view", "click_1h", "purchase_1h"}
    assert rows["view"] >= rows["click_1h"] >= rows["purchase_1h"] >= 0
    assert rows["view"] > 0


def test_retention_offset_zero_counts_every_user_once(spark, sf_dir):
    from hz_csv2parquet_spark.tables import table

    ret = REGISTRY["retention_cohorts_events"].fn(spark, sf_dir)
    # every user appears in their own cohort's offset-0 cell exactly
    # once, so offset-0 totals = number of distinct users
    offset0 = (
        ret.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    )
    n_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert offset0 == n_users
    # offsets are never negative (cohort = first activity week)
    assert ret.filter(F.col("week_offset") < 0).count() == 0


def test_path_trigrams_bounded_and_ranked(spark, sf_dir):
    rows = REGISTRY["event_path_trigrams"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    # trigram total = sum over users of max(events_u - 2, 0); bound it
    # by the total event count
    from hz_csv2parquet_spark.tables import table

    n_events = table(spark, sf_dir, "events").count()
    assert sum(ns) <= n_events


def test_trend_slope_group_counts_match_table(spark, sf_dir):
    from hz_csv2parquet_spark.tables import table

    got = {
        r.event_type: r.n
        for r in REGISTRY["trend_slope_by_type"].fn(spark, sf_dir).collect()
    }
    want = {
        r.event_type: r.cnt
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_quality_gate_keeps_at_most_everything_and_is_per_lang(spark, sf_dir):
    from hz_csv2parquet_spark.tables import table

    kept = REGISTRY["quality_percentile_filter_documents"].fn(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    per_lang_total = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    per_lang_kept = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n_kept in per_lang_kept.items():
        assert 0 < n_kept <= per_lang_total[lang]
    # a p25 floor on tokens + p75 cap on symbols keeps roughly the
    # central mass — never everything, in every language
    assert sum(per_lang_kept.values()) < sum(per_lang_total.values())


def test_oov_rate_bounds(spark, sf_dir):
    d = REGISTRY["vocab_oov_rate_documents"].fn(spark, sf_dir)
    bad = d.filter(
        (F.col("oov_rate") < 0)
        | (F.col("oov_rate") > 1)
        | (F.col("n_oov") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    # the >=5%-df core vocab must cover SOME tokens in a real corpus
    assert d.filter(F.col("n_oov") < F.col("n_tokens")).count() > 0
