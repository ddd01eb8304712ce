"""Dedup operator tests: tiny synthetic corpora with known near-dups
(bucket behavior, representative selection), plus planted-pair recall
on the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.dedup import (
    blocked_jaccard_pairs,
    exact_dedup,
    exact_dedup_summary,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash64,
    simhash64_frame,
    simhash_near_pairs,
)

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_A_NEAR = DOC_A + " again"  # one appended token → high Jaccard
DOC_B = "completely different words about spark catalyst optimizer plans and shuffles"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "s1", DOC_A), (2, "s1", DOC_A_NEAR), (3, "s1", DOC_B), (4, "s2", "  The  QUICK brown fox jumps over the lazy dog near the river bank today ")],
        "id long, src string, text string",
    )


def test_exact_dedup_normalizes_whitespace_and_case(spark, corpus):
    # doc 4 is doc 1 modulo case/whitespace → same hash group
    summary = exact_dedup_summary(corpus, "text", "id")
    groups = {r.keep_id: r.n_copies for r in summary.collect()}
    assert groups[1] == 2  # docs 1 and 4
    assert summary.count() == 3

    kept = sorted(r.id for r in exact_dedup(corpus, "text", "id").collect())
    assert kept == [1, 2, 3]  # doc 4 deduped into doc 1


def test_lsh_buckets_near_dups_together(spark, corpus):
    cand = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(corpus, "id", "text").collect()}
    assert (1, 2) in cand  # near-dup pair shares >=1 band bucket
    assert (1, 4) in cand  # exact-dup-modulo-normalization pair
    assert (1, 3) not in cand and (2, 3) not in cand  # unrelated doc


def test_minhash_pipeline_verifies_jaccard(spark, corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_dedup_pairs(corpus, "id", "text").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.6
    assert pairs[(1, 4)] == 1.0  # identical after normalization
    assert all(3 not in p for p in pairs)


def test_simhash_distance_tracks_similarity(spark, corpus):
    sigs = {
        r.id: (r.sig.s0, r.sig.s1)
        for r in corpus.select("id", simhash64("text").alias("sig")).collect()
    }
    for s0, s1 in sigs.values():  # both words are 32-bit non-negative
        assert 0 <= s0 < 2**32 and 0 <= s1 < 2**32
    ham = lambda a, b: bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    assert ham(sigs[1], sigs[4]) == 0  # identical normalized text
    assert ham(sigs[1], sigs[2]) <= 3  # one-token delta
    assert ham(sigs[1], sigs[3]) > 3  # different doc

    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(corpus, "id", "text").collect()}
    assert (1, 2) in pairs and (1, 4) in pairs


def test_simhash_frame_matches_column_form(spark, corpus, sf_dir):
    """The aggregate-form signature (explode → conv words → bit-sum
    hash agg) is bit-identical to the HOF-fold column form on both
    the synthetic corpus and the fixture documents — the frame form
    is purely a physical-plan rewrite."""
    col_sigs = {
        r.id: (r.sig.s0, r.sig.s1)
        for r in corpus.select("id", simhash64("text").alias("sig")).collect()
    }
    frame_sigs = {
        r["__id"]: (r["__s0"], r["__s1"])
        for r in simhash64_frame(corpus, "id", "text").collect()
    }
    assert frame_sigs == col_sigs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    col_docs = {
        r.doc_id: (r.sig.s0, r.sig.s1)
        for r in docs.select("doc_id", simhash64("text").alias("sig")).collect()
    }
    frame_docs = {
        r["__id"]: (r["__s0"], r["__s1"])
        for r in simhash64_frame(docs, "doc_id", "text").collect()
    }
    assert frame_docs == col_docs


def test_simhash_frame_null_text_matches_column_form(spark):
    df = spark.createDataFrame([(1, None), (2, "alpha beta"), (3, None)], "id long, text string")
    col_sigs = {
        r.id: (r.sig.s0, r.sig.s1)
        for r in df.select("id", simhash64("text").alias("sig")).collect()
    }
    frame_sigs = {
        r["__id"]: (r["__s0"], r["__s1"]) for r in simhash64_frame(df, "id", "text").collect()
    }
    assert frame_sigs == col_sigs


def test_simhash_pigeonhole_banding(spark):
    """Any pair within Hamming ≤ 3 of a 64-bit signature shares at
    least one 16-bit band (4 bands, ≤3 differing bits ⇒ one band
    untouched) — i.e. the bucketed join cannot miss a qualifying
    pair. Verified by comparing the banded operator against a direct
    all-pairs Hamming computation on the same corpus."""
    import itertools

    docs = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon " + tail
        for tail in ["", "x1", "x2", "y1 y2", "phi chi psi omega extra words here"]
    ]
    df = spark.createDataFrame(list(enumerate(docs)), "id long, text string")
    sigs = {
        r.id: (r.sig.s0, r.sig.s1)
        for r in df.select("id", simhash64("text").alias("sig")).collect()
    }
    ham = lambda a, b: bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    expected = {
        (i, j)
        for i, j in itertools.combinations(sorted(sigs), 2)
        if ham(sigs[i], sigs[j]) <= 3
    }
    got = {(r.id_a, r.id_b) for r in simhash_near_pairs(df, "id", "text").collect()}
    assert got == expected


def test_blocked_jaccard_respects_blocks(spark, corpus):
    # doc 4 is in block s2 → never compared with block-s1 docs,
    # even though it's a near-dup of doc 1
    pairs = {(r.id_a, r.id_b) for r in blocked_jaccard_pairs(corpus, "id", "text", "src").collect()}
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)


def test_planted_pair_recall_on_fixtures(spark, sf_dir):
    """The fixture dedup queries plant 100 near-dup pairs; MinHash-LSH
    recovers ≥95% (measured: 100/100 at sf0.01, 99/100 at sf0.001 —
    very short docs have few shingles, so one appended token can drop
    Jaccard below the band-collision range; that miss is inherent to
    LSH, deterministic, and mirrored exactly by the oracle)."""
    from hz_csv2parquet_spark.queries_text import _near_corpus

    pairs = minhash_dedup_pairs(_near_corpus(spark, sf_dir), "doc_id", "text")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1000000) for i in range(100)}
    assert len(planted & got) >= 95


def test_connected_components_chain_and_isolates(spark):
    """A 5-vertex chain (needs several propagation rounds to reach
    the far end) collapses to one component labeled by its minimum;
    isolated vertices keep their own label."""
    from hz_csv2parquet_spark.operators.graph import connected_components

    verts = spark.createDataFrame([(i,) for i in range(7)], ["v"])
    # chain 4-3-2-1-0 plus isolates 5, 6
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0)], ["src", "dst"]
    )
    lab = {r.v: r.lbl for r in connected_components(verts, edges).collect()}
    assert lab == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6}


def test_connected_components_long_chain_checkpoints(spark):
    """A 16-vertex path graph (diameter 15) forces propagation past
    the periodic localCheckpoint boundary (_CHECKPOINT_EVERY=8) —
    pins that lineage truncation doesn't corrupt labels and that the
    final frame's plan stays bounded (checkpointed plans are
    LogicalRDD leaves, not a 15-join chain)."""
    from hz_csv2parquet_spark.operators.graph import connected_components

    n = 16
    verts = spark.createDataFrame([(i,) for i in range(n)], ["v"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    lab = connected_components(verts, edges, max_iter=30)
    assert {r.v: r.lbl for r in lab.collect()} == {i: 0 for i in range(n)}
    # the returned plan must be small (a checkpoint leaf + one agg
    # layer), not the full 15-iteration join chain
    plan = lab._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 2, plan


def test_dup_clusters_transitive_merge(spark):
    """A~B and B~C pairs merge into one cluster of 3 with exactly one
    keep; the pair (id_a < id_b) orientation doesn't matter."""
    from hz_csv2parquet_spark.operators.graph import dup_clusters

    df = spark.createDataFrame([(10,), (11,), (12,), (13,)], ["doc_id"])
    pairs = spark.createDataFrame([(10, 11), (11, 12)], ["id_a", "id_b"])
    rows = {r.doc_id: r for r in dup_clusters(df, "doc_id", pairs).collect()}
    assert all(rows[i].cluster_id == 10 and rows[i].cluster_size == 3 for i in (10, 11, 12))
    assert [rows[i].keep for i in (10, 11, 12, 13)] == [True, False, False, True]
    assert rows[13].cluster_id == 13 and rows[13].cluster_size == 1


def test_jaccard_block_key_grows_with_corpus(spark, sf_dir):
    """The blocking key for pairwise Jaccard must be content-derived —
    its cardinality has to grow ~linearly with the corpus (a
    categorical key like `source` has ~constant cardinality, making
    in-block all-pairs quadratic at scale). Distinct documents get
    ~distinct (min, max) shingle-hash pairs; planted one-token
    appends keep their original's block. Measured on the fixture:
    225 blocks / 250 docs → 403 / 500, max block 6, 88/100 plants
    co-blocked."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.queries_text import jaccard_block_key
    from hz_csv2parquet_spark.tables import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    half = d.filter(F.col("doc_id") % 2 == 0)
    blk = jaccard_block_key("text")
    n_half, b_half = half.agg(F.count("*"), F.countDistinct(blk)).first()
    n_full, b_full = d.agg(F.count("*"), F.countDistinct(blk)).first()
    # near-unique per document, and growing with the corpus
    assert b_half > 0.7 * n_half
    assert b_full > 0.7 * n_full
    assert b_full > 1.4 * b_half
    # block sizes stay small (no hot block to go quadratic in)
    mx = d.groupBy(blk.alias("b")).count().agg(F.max("count")).first()[0]
    assert mx <= 10
    # planted append dups land in their original's block
    plants = d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        blk.alias("b_orig"),
        jaccard_block_key(F.concat(F.col("text"), F.lit(" zz9"))).alias("b_plant"),
    )
    same = plants.filter(F.col("b_orig") == F.col("b_plant")).count()
    assert same >= 0.8 * plants.count()


def test_pointer_doubling_matches_direct_walk(spark):
    """Pointer-doubling depths checked against a direct Python parent
    walk on an irregular forest (two roots, a deep chain, a bushy
    node) — covers depth growth past several doubling rounds."""
    from hz_csv2parquet_spark.operators.graph import pointer_doubling_depths

    parent = {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 7,  # chain depth 8
              10: 10, 11: 10, 12: 10, 13: 11}                         # second root
    df = spark.createDataFrame(sorted(parent.items()), "v long, parent long")
    got = {r.v: r.depth for r in pointer_doubling_depths(df).collect()}

    def walk(v):
        d = 0
        while parent[v] != v:
            v = parent[v]
            d += 1
        return d

    assert got == {v: walk(v) for v in parent}


def test_pointer_doubling_raises_on_cycle_and_missing_parent(spark):
    """The preconditions fail LOUDLY (ADVICE r5): a cycle exhausts
    the doubling rounds without the sum fixpoint → RuntimeError; a
    parent value that is not itself a vertex would be silently
    dropped by the pointer join → ValueError."""
    import pytest

    from hz_csv2parquet_spark.operators.graph import pointer_doubling_depths

    cyc = spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "v long, parent long")
    with pytest.raises(RuntimeError, match="cycle|fixpoint"):
        pointer_doubling_depths(cyc, max_iter=5)

    dangling = spark.createDataFrame([(1, 1), (2, 99)], "v long, parent long")
    with pytest.raises(ValueError, match="dropped"):
        pointer_doubling_depths(dangling, max_iter=5)
