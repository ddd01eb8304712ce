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

Two formulations with identical outputs, picked by document-size
regime:

- :func:`repetition_stats` (default) — fully NARROW: every stat comes
  from one projection over the token array (sorted-run fold for
  distinct/mode, hash-distinct for bigrams), O(n log n) per document,
  ZERO shuffles and zero joins. The naive per-row alternative
  (count each distinct token by re-scanning the array) is O(k·n) and
  was rightly rejected; the sorted-run fold is not that — one
  array_sort plus one linear pass. For web-scale corpora (documents
  ≤ a few MB) this beats the explode form by ~3× and removes four
  exchanges from the plan.
- :func:`repetition_stats_exploded` — the explode → two-level hash
  aggregation form, whose shuffle key is (doc_id, token). Its one
  advantage: a PATHOLOGICALLY huge document (GBs in one row)
  parallelizes across tasks instead of concentrating in one. Keep it
  for ingest paths that cannot bound per-document size.

The reference has no such surface (extension from the north-star
brief). Exact DuckDB mirrors live in queries_text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: conjunctive quality gate thresholds (Gopher-shaped, tuned so the
#: synthetic fixture corpus splits instead of passing vacuously)
MAX_DUP_TOKEN_FRAC = 0.80
MAX_TOP_TOKEN_FRAC = 0.20
MAX_DUP_BIGRAM_FRAC = 0.40
MIN_ALPHA_FRAC = 0.80


def _quality_select(id_col: str, counts: DataFrame) -> DataFrame:
    """Shared ratio/gate finish over the integer count columns
    ``(__id, n_tokens, n_distinct, top_cnt, n_alpha, n_bigrams,
    d_bigrams)`` — both formulations end here, so the output contract
    (and the DuckDB mirror) is defined once."""
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    dup_tok = F.lit(1.0) - dbl("n_distinct") / dbl("n_tokens")
    top_tok = dbl("top_cnt") / dbl("n_tokens")
    # guard the <2-token case explicitly: 0.0/0.0 in double is NaN
    # (not NULL), which coalesce would pass through
    dup_big = F.when(
        F.col("n_bigrams") > 0, F.lit(1.0) - dbl("d_bigrams") / dbl("n_bigrams")
    ).otherwise(F.lit(0.0))
    alpha = dbl("n_alpha") / dbl("n_tokens")
    return counts.select(
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


def _bigrams(t: Column) -> Column:
    n = F.size(t)
    return F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition + alphabetic-content statistics —
    narrow formulation (see module doc).

    Output: ``id_col, n_tokens, dup_token_frac, top_token_frac,
    dup_bigram_frac, alpha_frac, passes_quality`` — one row per input
    row with non-NULL text (documents with <2 tokens get
    ``dup_bigram_frac = 0.0``). NULL-text documents are DROPPED —
    the same contract as the exploded form (explode skips NULL
    arrays) and the DuckDB unnest mirror; the two formulations are
    row-identical on any input (pinned with a NULL-text case in
    tests/test_text_functions.py).

    distinct count and mode come from ONE pass over the sorted token
    array: equal tokens are adjacent after the sort, so a linear fold
    tracking (previous token, current run, max run, runs seen) yields
    the top-token multiplicity and the distinct count together.
    """
    base = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    st = F.array_sort(F.col("__t"))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["mx"], run).alias("mx"),
            F.when(same, acc["d"]).otherwise(acc["d"] + 1).alias("d"),
        )

    folded = F.aggregate(st, acc0, step)
    n = F.size(F.col("__t"))
    counts = base.select(
        "__id",
        n.cast("long").alias("n_tokens"),
        folded["d"].alias("n_distinct"),
        folded["mx"].alias("top_cnt"),
        F.size(F.filter(F.col("__t"), lambda x: x.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha"),
        F.greatest(n - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(_bigrams(F.col("__t")))).cast("long").alias("d_bigrams"),
    )
    return _quality_select(id_col, counts)


def repetition_stats_exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Identical output to :func:`repetition_stats` via explode →
    two-level hash aggregation — the formulation for unbounded
    per-document sizes (module doc). Equality of the two is pinned in
    tests/test_text_functions.py."""
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

    big = base.select("__id", F.explode(_bigrams(F.col("__t"))).alias("bg"))
    per_big = big.groupBy("__id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = per_big.groupBy("__id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("d_bigrams"),
    )

    joined = (
        tstats.join(bstats, "__id", "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
        .withColumn("d_bigrams", F.coalesce("d_bigrams", F.lit(0)))
    )
    return _quality_select(id_col, joined)
