"""Information-retrieval operators over the ``documents`` corpus:
BM25 ranked retrieval and inverted-index (posting-list) construction.

Extension surface (north star; the reference has no text/IR surface —
SURVEY.md §2.7). Both operators are built from the shapes that
survive 100 TB:

- **BM25**: the per-term statistics frame (df per query term) is tiny
  — |query terms| rows — and is computed with a *pre-filtered* explode
  (only tokens in the query set survive the explode), so the corpus
  is scanned once, narrow, and never shuffles on the raw token
  stream. Scoring is a broadcast join of the stats frame against the
  per-(doc, term) term frequencies; the final top-k is Spark's
  TakeOrdered (per-partition partial top-k, no global sort).
- **Inverted index**: posting lists are bounded *before* any
  collection — a two-level aggregation (token, doc) → token keeps
  every reduction key-partitioned, and the per-token posting sample
  is cut to the k smallest doc ids with a window rank over the
  already-reduced (token, doc) pairs, so no executor ever
  materializes an unbounded postings array (the classic stopword
  blowup in naive collect_set designs).

The BM25 idf uses the Robertson rational form *without* the log —
``(N - df + 0.5) / (df + 0.5)`` — a documented deviation: log/ln are
not correctly-rounded-guaranteed across engines, while +,-,*,/ are,
and the rational form preserves the ranking for any fixed corpus
(log is monotone). That choice is what lets the driver's value-hash
gate hold bit-exactly against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..functions.text import tokens

#: BM25 free parameters (standard defaults). 0.75 is binary-exact;
#: 1.2 parses to the same double in Spark and DuckDB (both IEEE-754
#: round-to-nearest decimal literals), so mirrored arithmetic agrees.
BM25_K1 = 1.2
BM25_B = 0.75


def doc_token_stats(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, dl) frame: per-document token count of the normalized
    text. Narrow projection — no shuffle."""
    return documents.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl")
    )


def bm25_topk(
    documents: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    memo_slot: str = "bm25_tokens",
) -> DataFrame:
    """Top-``k`` documents by BM25 (rational-idf variant) for a fixed
    ``query_terms`` bag.

    Plan shape (the one you'd run at 100 TB):
      1. ONE tokenize pass: the (doc, token-array) frame is
         materialized via the single-slot memo — the plan below it
         fans out to three consumers (corpus stats, tf, df) and
         DataFrame plans share no common subtrees, so without the
         boundary the corpus would be re-read and re-tokenized once
         per consumer (measured: four full tokenize passes per run
         before round 15). At cluster scale the durable form of the
         memo is a parquet write of the same narrow frame.
      2. per-doc (dl, per-query-term tf) via a pre-filtered explode
         over the materialized arrays (non-query tokens die map-side;
         dl rides the exploded rows so no doc-grain join is needed),
      3. corpus size + avgdl reduced to ONE broadcast row; per-term
         df as a window-count over the already-reduced (doc, term)
         frame (vocab grain — the top_terms_per_lang idiom) instead
         of a second corpus-scale aggregation,
      4. score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
         summed through DECIMAL(38,10) so the float sum is
         order-insensitive (functions/exact.py),
      5. TakeOrdered top-k on (score DESC, doc id) — per-partition
         partial top-k, never a global sort.

    (A fully map-side variant — per-term tf via array filter/size
    lambdas, zero explode — measured 1.7× SLOWER at sf0.1:
    higher-order array lambdas run interpreted, outside whole-stage
    codegen. The explode+isin form here keeps the token hot path in
    codegen and pays the tokenize exactly once.)

    ``memo_slot`` names the single-slot memo this operator's token
    arrays occupy (advisor r15): the memo registry holds ONE live
    frame per slot, so composing two bm25_topk frames in one job —
    different corpora or term bags — must pass distinct slots or the
    later build evicts the earlier frame's cache before it executes.
    NULL-``id_col`` rows (advisor r15): the oracle counts them in the
    corpus stats (``COUNT(*)`` over dl) but its ``tf JOIN dl USING
    (doc_id)`` and ``COUNT(DISTINCT doc_id)`` drop them from tf/df
    and the scored output — so the tf stream below filters them
    explicitly (the pre-r15 doc-grain join did it implicitly) while
    the corpus aggregate stays unfiltered.
    """
    from ..tables import memo_persist

    terms = sorted(set(query_terms))
    base = memo_persist(
        documents.select(F.col(id_col), tokens(text_col).alias("__t")),
        memo_slot,
    )

    # corpus stats: N, avgdl — one row off the materialized arrays,
    # map-side collapsible, no tokenize (same expressions as the old
    # doc_token_stats pass: count over all rows, sum of size(tokens))
    corpus = base.select(F.size("__t").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    # per-(doc, term) tf with dl riding along — the filtered stream is
    # small by construction; min(dl) is exact (dl is constant per doc)
    tf = (
        base.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col), F.size("__t").alias("dl"), F.explode("__t").alias("tok")
        )
        .filter(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )

    # per-term df: one row per (doc, term) above, so a window COUNT
    # partitioned on the term is exactly the old
    # count_distinct(doc) — computed at (doc,term) grain with one tiny
    # exchange instead of re-aggregating the corpus token stream
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )

    scored = (
        tf.crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            "tf",
            "dl",
            (
                (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
            ).alias("idf_num"),
            (F.col("df").cast("double") + F.lit(0.5)).alias("idf_den"),
            (
                F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
            ).alias("avgdl"),
        )
        .select(
            F.col(id_col),
            (
                (F.col("idf_num") / F.col("idf_den"))
                * (
                    (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(BM25_K1)
                        * (
                            F.lit(1.0 - BM25_B)
                            + F.lit(BM25_B)
                            * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(exact_sum("term_score").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def inverted_index(
    documents: DataFrame,
    id_col: str,
    text_col: str,
    posting_sample: int = 8,
) -> DataFrame:
    """Vocabulary-grain index frame: one row per token with its
    document frequency, total term frequency, and a bounded posting
    sample (the ``posting_sample`` smallest doc ids, comma-joined).

    Two-level reduction keeps every intermediate bounded:
    (doc, token) pairs reduce first (map-side combinable), the
    token-grain stats reduce the *pair* frame, and the posting sample
    is a rank-≤-k cut of the pair frame — never an unbounded
    collect_set. All three shuffles share the token key."""
    toks = documents.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tok")
    )
    pairs = toks.groupBy("tok", "doc").agg(F.count(F.lit(1)).alias("tfp"))
    stats = pairs.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tfp").alias("tf_total")
    )
    w = Window.partitionBy("tok").orderBy("doc")
    postings = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= posting_sample)
        .groupBy("tok")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(postings, "tok").select(
        F.col("tok").alias("token"), "df", "tf_total", "postings"
    )
