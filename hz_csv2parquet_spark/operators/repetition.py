"""Repetition / quality heuristics over a document corpus
(Gopher-style filters: Rae et al. 2021 §A1.1, and the C4 cleanup
rules) — the "is this document natural text or boilerplate/spam"
pass every LLM training-data pipeline runs before dedup.

Per document:

- ``dup_token_frac``   — 1 − distinct/total tokens (duplicate-word mass)
- ``top_token_frac``   — frequency of the single most common token
- ``dup_bigram_frac``  — 1 − distinct/total word bigrams
- ``alpha_frac``       — fraction of token occurrences containing a
  letter (Gopher's "80% of words must contain an alphabetic char")
- ``passes_quality``   — the conjunctive gate over the above

Scale design: all ratios come from **explode → two-level hash
aggregation** (token counts per doc, then stats per doc), never from
per-row loops over token arrays — a document is allowed to be huge
(the per-(doc,token) combine is map-side partial), and the shuffle
key is (doc_id, token), which is as fine-grained and skew-free as
keys get. The alternative — per-row higher-order functions computing
mode/distinct inside one value — is O(k²) per document and
concentrates whole documents in single tasks; rejected by design.

The reference has no such surface (extension from the north-star
brief). Exact DuckDB mirrors live in queries_text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: conjunctive quality gate thresholds (Gopher-shaped, tuned so the
#: synthetic fixture corpus splits instead of passing vacuously)
MAX_DUP_TOKEN_FRAC = 0.80
MAX_TOP_TOKEN_FRAC = 0.20
MAX_DUP_BIGRAM_FRAC = 0.40
MIN_ALPHA_FRAC = 0.80


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition + alphabetic-content statistics.

    Output: ``id_col, n_tokens, dup_token_frac, top_token_frac,
    dup_bigram_frac, alpha_frac, passes_quality`` — one row per input
    row (documents with <2 tokens get ``dup_bigram_frac = 0.0``).
    """
    # let-bind the token array once; downstream expressions reference
    # the bound column, never re-evaluate normalize+split
    base = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t"))

    tok = base.select("__id", F.explode("__t").alias("tok"))
    per_tok = tok.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("c"))
    tstats = per_tok.groupBy("__id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_cnt"),
        F.sum(
            F.when(F.col("tok").rlike("[a-z]"), F.col("c")).otherwise(F.lit(0))
        ).alias("n_alpha"),
    )

    # word bigrams: zip the token array against itself shifted by one
    n = F.size(F.col("__t"))
    bigrams = F.zip_with(
        F.slice(F.col("__t"), 1, n - 1),
        F.slice(F.col("__t"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    big = base.select("__id", F.explode(bigrams).alias("bg"))
    per_big = big.groupBy("__id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = per_big.groupBy("__id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("d_bigrams"),
    )

    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    joined = tstats.join(bstats, "__id", "left")
    dup_tok = F.lit(1.0) - dbl("n_distinct") / dbl("n_tokens")
    top_tok = dbl("top_cnt") / dbl("n_tokens")
    dup_big = F.coalesce(
        F.lit(1.0) - dbl("d_bigrams") / dbl("n_bigrams"), F.lit(0.0)
    )
    alpha = dbl("n_alpha") / dbl("n_tokens")
    return joined.select(
        F.col("__id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        dup_tok.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        dup_big.alias("dup_bigram_frac"),
        alpha.alias("alpha_frac"),
        (
            (dup_tok <= MAX_DUP_TOKEN_FRAC)
            & (top_tok <= MAX_TOP_TOKEN_FRAC)
            & (dup_big <= MAX_DUP_BIGRAM_FRAC)
            & (alpha >= MIN_ALPHA_FRAC)
        ).alias("passes_quality"),
    )
