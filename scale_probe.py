#!/usr/bin/env python3
"""Empirical scaling probe — measures how the dedup / similarity /
text operators scale as the corpus grows, to back the catalog's
design-for-100-TB claims with numbers instead of argument.

Builds N×-replicated variants of the ``documents`` and
``embeddings`` fixtures (other tables symlinked unchanged) and times
a fixed operator set at each scale, then fits the log-log slope
time ~ rows^alpha per operator. The banded/bucketed designs
(MinHash-LSH, SimHash pigeonhole, broadcast top-k) should read
alpha ≈ 1; an all-pairs regression would read alpha ≈ 2 and fail
the gate below.

Replication must not CREATE near-duplicates across copies, or the
candidate-pair count (and the true answer) would grow
quadratically in the copy count by construction and the probe would
measure the corpus change, not the operator:

- documents: every whitespace token of copy ``i`` gets an ``_i``
  suffix, so shingles are DISJOINT across copies — each copy
  reproduces the base corpus's internal dup structure and nothing
  else (doc_id remapped to stay unique).
- embeddings: a deterministic per-copy, per-position perturbation
  (± a few 1e-3) breaks exact-duplicate degeneracy while keeping
  vectors on the same shell (vec_id remapped likewise).

Usage:  python scale_probe.py [--scales 1,3,10,30] [--runs 2]
Prints one JSON line: {"rows": {...}, "times": {...}, "alpha": {...}}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: operators probed: the headline dedup family (exact hash groupBy,
#: banded MinHash-LSH, SimHash pigeonhole), the pure-expression text
#: pass, and the two ANN paths (broadcast brute-force, sign-LSH).
PROBES = [
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "dedup_simhash_documents",
    "text_stats_documents",
    "similarity_topk_embeddings",
    "similarity_lsh_embeddings",
    # round-15: the trained-quantizer IVF path joined the probe after
    # its assignment rewrite (row-local fold over broadcast
    # centroids) — training is sample-sized, assignment map-only,
    # probed-cell scan linear in the corpus, so alpha ≈ 1 is the
    # design claim. semantic_dedup is deliberately NOT probed: its
    # in-cell comparison is O(n²/k) BY DESIGN and the published
    # config scales k with the corpus, which the fixed-k query
    # cannot do — a fixed-k probe would measure that documented
    # trade, not a regression.
    "similarity_ivf_embeddings",
]

#: fail the probe if any operator's fitted exponent exceeds this —
#: alpha ≈ 2 is the all-pairs signature the designs exist to avoid.
ALPHA_GATE = 1.5


def build_scale(spark, out_dir: str, copies: int) -> int:
    """Materialize the ``copies``×-replicated fixture dir; returns
    the scaled documents row count."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE, f), dst)

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    cp = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__copy")

    sdocs = (
        docs.select("*", cp)
        .withColumn("doc_id", F.col("doc_id") * copies + F.col("__copy"))
        .withColumn(
            "text",
            # suffix every token with the copy index -> shingle sets
            # are disjoint across copies (no synthetic near-dups);
            # copy 0 keeps the base text byte-identical
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(
                            w, F.lit("_"), F.col("__copy").cast("string")
                        ),
                    ),
                    " ",
                )
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("__copy")
    )
    semb = (
        emb.select("*", cp)
        .withColumn("vec_id", F.col("vec_id") * copies + F.col("__copy"))
        .withColumn(
            "embedding",
            # deterministic per-copy, per-position jitter: breaks
            # duplicate-vector degeneracy, preserves scale/shape
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + (F.col("__copy") % 5).cast("float")
                * ((i % 7).cast("float") - F.lit(3.0))
                * F.lit(1e-3),
            ).cast("array<float>"),
        )
        .drop("__copy")
    )
    sdocs.coalesce(max(1, copies // 4)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    semb.coalesce(max(1, copies // 4)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    return spark.read.parquet(
        os.path.join(out_dir, "documents.parquet")
    ).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10,30")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from hz_csv2parquet_spark.queries import REGISTRY
    from hz_csv2parquet_spark.session import get_spark
    from hz_csv2parquet_spark.tables import memo_clear

    spark = get_spark(app="hz_scale_probe")
    root = tempfile.mkdtemp(prefix="hz_scale_")
    rows: dict[int, int] = {}
    times: dict[str, dict[int, float]] = {n: {} for n in PROBES}
    try:
        for s in scales:
            sf_dir = BASE if s == 1 else os.path.join(root, f"x{s}")
            if s == 1:
                rows[s] = (
                    spark.read.parquet(
                        os.path.join(BASE, "documents.parquet")
                    ).count()
                )
            else:
                rows[s] = build_scale(spark, sf_dir, s)
            for name in PROBES:
                q = REGISTRY[name]
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()  # warm: listing, JIT, broadcast
                best = math.inf
                for _ in range(args.runs):
                    memo_clear()
                    import gc

                    gc.collect()
                    try:
                        spark.sparkContext._jvm.System.gc()
                    except Exception:
                        pass
                    t0 = time.perf_counter()
                    q.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                times[name][s] = round(best, 3)
                print(
                    f"[probe] x{s} ({rows[s]} docs) {name}: {best:.2f}s",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # log-log least-squares slope of time vs scale
    alpha: dict[str, float] = {}
    for name, ts in times.items():
        xs = [math.log(s) for s in ts]
        ys = [math.log(t) for t in ts.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha[name] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
        )
    out = {
        "rows": rows,
        "times": {n: {str(s): t for s, t in ts.items()} for n, ts in times.items()},
        "alpha": alpha,
        "alpha_gate": ALPHA_GATE,
        "super_linear": sorted(n for n, a in alpha.items() if a > ALPHA_GATE),
    }
    print(json.dumps(out))
    return 1 if out["super_linear"] else 0


if __name__ == "__main__":
    sys.exit(main())
