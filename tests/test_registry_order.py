"""The driver's correctness gate verifies only a capped prefix (50)
of the ``queries()`` dict — pin that every priority query (the
text/dedup suite plus anything changed this round) sits inside that
window, and that nothing is lost or duplicated by the reordering."""

from hz_csv2parquet_spark.queries import REGISTRY, ordered_registry

DRIVER_WINDOW = 50

# every query here either had no driver CORRECTNESS row through round 2
# (the text/dedup suite + streaming_enrich_events) or changed its
# implementation in round 3 (the LSH/IVF hardening) — all must be
# inside the driver's capped verify window.
MUST_BE_IN_WINDOW = {
    "text_stats_documents",
    "text_quality_by_lang",
    "repetition_stats_documents",
    "top_terms_per_lang",
    "contamination_check_documents",
    "sample_stratified_documents",
    "shard_assignment_documents",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "dedup_simhash_documents",
    "ngram_jaccard_pairs",
    "levenshtein_near_pairs",
    "grouped_lang_stats_pandas",
    "quota_sample_per_source",
    "streaming_enrich_events",
    "embedding_near_pairs",
    "similarity_ivf_embeddings",
}


def test_priority_queries_inside_driver_window():
    window = list(ordered_registry())[:DRIVER_WINDOW]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"priority queries outside driver window: {missing}"


def test_ordering_is_a_permutation_of_the_registry():
    assert set(ordered_registry()) == set(REGISTRY)
    assert len(ordered_registry()) == len(REGISTRY)


def test_priority_block_is_a_stable_prefix():
    names = list(ordered_registry())
    flags = [ordered_registry()[n].priority for n in names]
    # all priority entries precede all non-priority entries
    assert flags == sorted(flags, reverse=True)
