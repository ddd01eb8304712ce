"""The driver's correctness gate verifies only a capped prefix (50)
of the ``queries()`` dict — pin that every priority query (the
text/dedup suite plus anything changed this round) sits inside that
window, and that nothing is lost or duplicated by the reordering."""

from hz_csv2parquet_spark.queries import REGISTRY, ordered_registry

DRIVER_WINDOW = 50

# round-4 re-verify set: every query whose implementation changed
# after its last driver-green CORRECTNESS row (round-3 edits the
# driver never re-checked: asof, bucketed join, multimodal,
# similarity/quantize; round-4 edits: block-key rewrite, two-phase
# rank, overflow/memo hardening) plus the queries new this round —
# all must sit inside the driver's capped verify window.
MUST_BE_IN_WINDOW = {
    # round-3 edits without a fresh driver row
    "asof_last_click",
    "bucketed_join_revenue",
    "multimodal_byte_features",
    "multimodal_decode_shapes",
    "multimodal_frame_index",
    "similarity_topk_embeddings",
    "similarity_lsh_embeddings",
    "similarity_topk_pandas_udf",
    "quantize_embeddings_int8",
    # round-4 implementation changes
    "ngram_jaccard_pairs",
    "levenshtein_near_pairs",
    "ntile_customer_quartiles",
    "zscore_outliers_events",
    "weighted_sample_documents",
    "dedup_cluster_documents",
    "dedup_minhash_documents",
    "dedup_simhash_documents",
    "embedding_near_pairs",
    "similarity_ivf_embeddings",
    "semantic_dedup_embeddings",
    "sample_stratified_documents",
    "shard_assignment_documents",
    "global_shuffle_documents",
    "mixture_resample_documents",
    # new in round 4
    "percentiles_by_segment_scalable",
    "streaming_attribution_outer",
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
