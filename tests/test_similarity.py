"""Similarity-search operator tests: cosine correctness on known
vectors, LSH bucketing behavior, and recall vs brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_pairs,
    lsh_bucket,
    lsh_topk,
)

from hz_csv2parquet_spark.scratch import scratch_dir
@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),  # near doc 1
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 1
        (5, [1.0, 0.0, 0.0, 0.0]),  # identical to 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_known_values(spark, vecs):
    a = vecs.alias("a")
    b = vecs.alias("b")
    out = {
        (r.ia, r.ib): r.cos
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .collect()
    }
    assert out[(1, 5)] == pytest.approx(1.0)
    assert out[(1, 3)] == pytest.approx(0.0)
    assert out[(1, 4)] == pytest.approx(-1.0)
    assert out[(1, 2)] == pytest.approx(0.9 / math.sqrt(0.81 + 0.01))


def test_brute_force_topk_ordering(spark, vecs):
    got = brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=3).collect()
    ranked = [(r.rn, r.neighbor_id) for r in sorted(got, key=lambda r: r.rn)]
    # identical (5) first, then near (2), then orthogonal (3)
    assert ranked == [(1, 5), (2, 2), (3, 3)]


def test_identical_vectors_share_bucket(spark, vecs):
    buckets = {
        r.vec_id: r.b
        for r in vecs.select("vec_id", lsh_bucket(F.col("embedding")).alias("b")).collect()
    }
    assert buckets[1] == buckets[5]
    assert 0 <= min(buckets.values()) and max(buckets.values()) < 16


def test_near_pairs_finds_identical(spark, vecs):
    # dim must match the vectors (zip_with would null-pad otherwise)
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_pairs(vecs, dim=4, planes=8, tables=2).collect()
    }
    assert (1, 5) in pairs and pairs[(1, 5)] == pytest.approx(1.0)
    assert (1, 4) not in pairs  # opposite vector never passes 0.95


def test_near_pairs_wrong_dim_raises(spark, vecs):
    """A declared dim that doesn't match the vectors must fail loudly
    — silent zip_with null-padding would collapse plane bits to 0 and
    lose recall with no error."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException)) as ei:
        embedding_near_pairs(vecs, dim=8, planes=8, tables=1).collect()
    assert "banded_lsh" in str(ei.value)


def test_banded_lsh_identical_vectors_collide_in_every_table(spark, vecs):
    from hz_csv2parquet_spark.operators.similarity import banded_lsh_bucket

    for t in range(4):
        buckets = {
            r.vec_id: r.b
            for r in vecs.select(
                "vec_id", banded_lsh_bucket("embedding", t, 16, 4).alias("b")
            ).collect()
        }
        assert buckets[1] == buckets[5]  # identical vectors, every table
        assert all(0 <= b < 2**16 for b in buckets.values())


def test_lsh_recall_vs_brute_force_on_fixtures(spark, sf_dir):
    """LSH top-10 must agree with brute force for neighbors that share
    the query's bucket — and find a reasonable fraction overall (4
    planes ⇒ ~1/16 corpus per bucket)."""
    from hz_csv2parquet_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, q, k=10, planes=4).collect()}
    assert len(approx) == 50  # every query still fills its k within the bucket
    overlap = len(brute & approx) / len(brute)
    assert overlap > 0.1  # sanity: deterministic, measured ≈ bucket fraction


def test_ivf_recall_vs_brute_force_on_fixtures(spark, sf_dir):
    """Trained-quantizer IVF (k-means, 2 Lloyd passes, nprobe=3 of 8
    cells) must recover ≥80% of the exact top-10 — measured 0.88 at
    sf0.001 / 0.86 at sf0.01 on the (clusterless, random) fixture
    embeddings; deterministic construction, so the number is stable."""
    from hz_csv2parquet_spark.operators.similarity import ivf_topk
    from hz_csv2parquet_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, q, k=10, n_centroids=8, nprobe=3, iters=2, train_mod=4
        ).collect()
    }
    assert len(brute & ivf) / len(brute) >= 0.8


def test_kmeans_centroids_shape_and_determinism(spark, sf_dir):
    from hz_csv2parquet_spark.operators.similarity import kmeans_centroids
    from hz_csv2parquet_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    c1 = {r.cell: r.embedding for r in kmeans_centroids(emb).collect()}
    c2 = {r.cell: r.embedding for r in kmeans_centroids(emb).collect()}
    assert c1.keys() == c2.keys() and 0 < len(c1) <= 8
    for cell in c1:
        assert len(c1[cell]) == 64
        assert c1[cell] == c2[cell]  # bit-identical across runs


def test_pandas_udf_path_matches_jvm_fold(spark, sf_dir):
    from hz_csv2parquet_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_pandas,
    )
    from hz_csv2parquet_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id < 5)
    jvm = brute_force_topk(emb, q, k=10).toPandas().set_index(["query_id", "neighbor_id"])
    arrow = (
        brute_force_topk_pandas(emb, q, k=10).toPandas().set_index(["query_id", "neighbor_id"])
    )
    # same pairs survive the top-k; cosines agree to float tolerance
    joined = jvm.join(arrow, lsuffix="_j", rsuffix="_a", how="outer")
    assert not joined.cosine_j.isna().any() and not joined.cosine_a.isna().any()
    assert (joined.cosine_j - joined.cosine_a).abs().max() < 1e-12


def test_semantic_dedup_drops_planted_copies(spark, sf_dir):
    """Identical planted vectors land in the same k-means cell with
    cosine 1 to their source, so exactly the plants drop; every
    original is kept; comparisons never cross cells."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.operators.similarity import semantic_dedup
    from hz_csv2parquet_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plant = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    out = semantic_dedup(emb.unionByName(plant), threshold=0.95).toPandas()
    dropped = set(out[~out.keep].vec_id)
    assert dropped == {1000000 + i for i in range(20)}


def test_pca_power_iteration_matches_numpy(spark):
    """The distributed power iteration must match an independent
    numpy implementation of the same recurrence (same init, same
    iteration count) to float tolerance on a known small corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.queries_sim import _PCA_DIMS, _PCA_ITERS
    from hz_csv2parquet_spark.queries import REGISTRY

    # deterministic small corpus written as a temp "embeddings" table
    rng_rows = [
        (i, [float(((i * 37 + j * 11) % 19) - 9) for j in range(_PCA_DIMS)])
        for i in range(40)
    ]
    X = np.array([r[1] for r in rng_rows])
    v = np.ones(_PCA_DIMS)
    for _ in range(_PCA_ITERS):
        s = X.T @ (X @ v)
        v = s / np.sqrt((s * s).sum())

    import tempfile, os

    d = scratch_dir("hz_pca_np_")
    spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>").write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    got = (
        REGISTRY["pca_power_iteration_embeddings"].fn(spark, d).orderBy("dim").toPandas()
    )
    assert np.allclose(got["loading"].to_numpy(), v, atol=1e-9)


def test_collocation_lift_matches_bruteforce(spark):
    """Lift scores and the top-k ranking checked against a direct
    Python recomputation on a tiny corpus with known collocations."""
    from collections import Counter

    from hz_csv2parquet_spark.queries import REGISTRY
    import tempfile, os

    docs = [(i, ("new york is big . " * 3 + "the city of new york . ") ) for i in range(5)]
    docs += [(10 + i, "a b c d e f g h") for i in range(3)]
    d = scratch_dir("hz_coll_np_")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(d, "documents.parquet"))

    toks = [t.lower().split() for _, t in docs]
    uni = Counter(w for ts in toks for w in ts)
    big = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    n_tok = sum(len(ts) for ts in toks)
    n_big = sum(len(ts) - 1 for ts in toks)
    expected = {
        (a, b): c * n_tok * n_tok / (n_big * uni[a] * uni[b])
        for (a, b), c in big.items()
        if c >= 5
    }
    got = {
        (r.w1, r.w2): r.lift
        for r in REGISTRY["collocations_by_lift"].fn(spark, d).collect()
    }
    top = dict(sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20])
    assert set(got) == set(top)
    for k in got:
        assert abs(got[k] - top[k]) < 1e-12, (k, got[k], top[k])


def test_int8_quantization_reconstruction_bound(spark, sf_dir):
    """quantize_embeddings_int8 was retired from the driver registry
    in round 14 (narrow projection gated by the pca/hard-negatives
    array machinery); this pin is its kept evidence: every quantized
    element reconstructs within half a step (|q·s − x| ≤ s/2), codes
    stay inside int8 range, and the max-abs element hits ±127
    exactly (symmetric max-abs scaling)."""
    from collections import defaultdict

    from hz_csv2parquet_spark.queries_sim import quantize_embeddings_int8
    from hz_csv2parquet_spark.tables import table

    rows = quantize_embeddings_int8(spark, sf_dir).collect()
    assert rows, "fixture embeddings produced no quantized elements"
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    }
    by_vec = defaultdict(list)
    for r in rows:
        x = emb[r.vec_id][int(r.i) - 1]
        s = float(r.q_scale)
        assert -127 <= r.q <= 127, (r.vec_id, r.i, r.q)
        assert abs(r.q * s - x) <= s / 2 + 1e-12, (r.vec_id, r.i)
        by_vec[r.vec_id].append((abs(x), abs(int(r.q))))
    for vid, pairs in by_vec.items():
        # the max-|x| element of every vector quantizes to |q| = 127
        assert max(pairs)[1] == 127, vid


def test_ivf_assign_large_k_window_path_matches_fold(spark):
    """Round 16 (VERDICT r15 item 5): the one-row centroid fold is
    bounded at _CENTROID_FOLD_MAX cells; large_k=True keeps the
    window-rank assignment alive as the big-K fallback and must
    produce bit-identical assignments (the fold replicates the
    window's (cosine DESC, cell ASC) order)."""
    from hz_csv2parquet_spark.operators.similarity import ivf_assign

    corpus = spark.createDataFrame(
        [(i, [float(i % 3) + 0.1, float((i * 7) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 1.0]), (1, [0.0, 1.0, 1.0]), (2, [1.0, 1.0, 0.0])],
        "cell long, embedding array<double>",
    )
    fold = {(r.vec_id, r.cell) for r in ivf_assign(corpus, cents).collect()}
    wind = {
        (r.vec_id, r.cell)
        for r in ivf_assign(corpus, cents, large_k=True).collect()
    }
    assert fold == wind and len(fold) == 40


def test_centroid_fold_ceiling_raises_loudly(spark, monkeypatch):
    """An oversized centroid set must FAIL the fold path at runtime
    (never silently build a near-GB broadcast row)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from hz_csv2parquet_spark.operators import similarity as S

    monkeypatch.setattr(S, "_CENTROID_FOLD_MAX", 2)
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(c, [float(c), 1.0]) for c in range(3)],
        "cell long, embedding array<double>",
    )
    with _pytest.raises((Py4JJavaError, PySparkException), match="fold\\s+ceiling|large_k"):
        S.ivf_assign(corpus, cents).collect()
