"""Text-function unit tests: lang-id on unambiguous inputs, quality
flags on constructed edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from hz_csv2parquet_spark.functions.text import lang_id, normalize_text, quality_flags, token_count


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col("t").alias("v")).collect()[0].v


def test_lang_id_picks_dominant_stopwords(spark):
    assert _one(spark, "the cat and the dog in a house", lang_id) == "en"
    assert _one(spark, "der Hund und die Katze ist ein Tier", lang_id) == "de"
    assert _one(spark, "le chat et la maison est un animal", lang_id) == "fr"
    assert _one(spark, "el gato y la casa es un animal", lang_id) == "es"
    assert _one(spark, "xylophone zebra quark plasma", lang_id) == "und"


def test_lang_id_tie_breaks_alphabetically(spark):
    # 'la' is a stopword of both es and fr with equal ratio → 'es'
    assert _one(spark, "zz la zz", lang_id) == "es"


def test_normalize_collapses_all_whitespace(spark):
    assert _one(spark, "  A \t b\n\nC  ", normalize_text) == "a b c"


def test_token_count_on_degenerate_inputs(spark):
    assert _one(spark, "one two three", token_count) == 3
    assert _one(spark, "   spaced   out   ", token_count) == 2
    assert _one(spark, "single", token_count) == 1


def test_repetition_stats_edge_docs(spark):
    from hz_csv2parquet_spark.operators.repetition import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one token repeated
            (2, "alpha beta gamma delta epsilon zeta"),  # all unique
            (3, "12 34 56 78 90"),  # numeric-only tokens
            (4, "word"),  # single token, no bigrams
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1].dup_token_frac == 0.8 and rows[1].top_token_frac == 1.0
    assert rows[1].dup_bigram_frac == 0.75 and not rows[1].passes_quality
    assert rows[2].dup_token_frac == 0.0 and rows[2].alpha_frac == 1.0
    assert rows[3].alpha_frac == 0.0 and not rows[3].passes_quality
    assert rows[4].n_tokens == 1 and rows[4].dup_bigram_frac == 0.0


def test_quality_flags_boundaries(spark):
    df = spark.createDataFrame(
        [("ok", "five words of decent length here"),
         ("short", "too few"),
         ("symbols", "@@ ## $$ %% ^^ && ** (( )) !!")],
        "name string, t string",
    )
    flags = quality_flags("t")
    rows = {r.name: r for r in df.select("name", *[v.alias(k) for k, v in flags.items()]).collect()}
    assert rows["ok"].n_tokens_ok and rows["ok"].symbols_ok
    assert not rows["short"].n_tokens_ok  # < 5 tokens
    assert not rows["symbols"].symbols_ok  # punctuation-heavy


def test_repetition_formulations_agree(spark):
    """The narrow (sorted-run fold) and exploded (two-level hash agg)
    repetition formulations must be bit-identical on every stat,
    including the <2-token edge docs."""
    from hz_csv2parquet_spark.operators.repetition import (
        repetition_stats,
        repetition_stats_exploded,
    )

    docs = [
        (1, "the cat sat on the mat the cat"),
        (2, "a a a a a a a a"),
        (3, "one"),
        (4, "42 7 42 !!! ??? 42"),
        (5, "x y"),
        (6, None),  # NULL text: BOTH formulations drop the doc
        (7, ""),  # empty text: one '' token, both keep it
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    b = {r.doc_id: r for r in repetition_stats_exploded(df, "doc_id", "text").collect()}
    assert set(a) == set(b)
    assert 6 not in a and 7 in a
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])
