"""Text-analysis primitives for the LLM-data-pipeline surface.

Everything here is a pure ``pyspark.sql.functions`` expression (JVM-
side, whole-stage-codegen) with an exact DuckDB SQL mirror right next
to it — the pairing is what lets every text operator go through the
driver's hash-matching oracle. Parity traps that bit us and are
encoded here once:

- DuckDB ``regexp_replace`` replaces the FIRST match unless the
  ``'g'`` flag is passed; Spark replaces all. Every mirror passes 'g'.
- DuckDB ``list_slice(l, i, j)`` is inclusive of ``j``; Spark
  ``slice(l, i, n)`` takes a length → ``j = i + n - 1``.
- Both engines' ``substring``/``instr``/``md5`` agree exactly
  (1-based, lowercase hex, UTF-8), which is what makes cross-engine
  hashing possible at all.

The reference has no text surface (SURVEY.md §2.7: no string
functions beyond path helpers) — this module is extension surface
from the north star, built for the ``documents`` fixture table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# normalization + tokenization
# ---------------------------------------------------------------------


def normalize_text(c: Column | str) -> Column:
    """Lowercase, trim, collapse internal whitespace to single spaces
    — the canonical form every hash/shingle operator keys on."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def sql_normalize_text(col: str) -> str:
    return f"lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text (split on the single
    spaces normalize_text guarantees)."""
    return F.split(normalize_text(c), " ")


def sql_tokens(col: str) -> str:
    return f"string_split({sql_normalize_text(col)}, ' ')"


def sql_shingles(textexpr: str, n: int = 3) -> str:
    """DuckDB mirror of operators.dedup.shingle_set: distinct word
    n-grams of the normalized text."""
    toks = sql_tokens(textexpr)
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks})-{n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i+{n - 1}), ' ')))"
    )


# ---------------------------------------------------------------------
# per-document statistics
# ---------------------------------------------------------------------

#: tiny per-language stopword lists for the n-gram/stopword lang-id
#: heuristic. Deliberately small and hard-coded: the heuristic (not
#: the list) is the operator under test.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "los", "y", "es", "un", "que"),
    "fr": ("le", "la", "les", "et", "est", "un", "que"),
}


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c)).cast("long")


def sql_token_count(col: str) -> str:
    return f"CAST(len({sql_tokens(col)}) AS BIGINT)"


def stopword_count(c: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(sw, t))).cast("long")


def sql_stopword_count(col: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({sql_tokens(col)}, t -> list_contains([{lst}], t))) AS BIGINT)"
    )


def non_alnum_ratio(c: Column | str) -> Column:
    """Fraction of normalized characters outside [a-z0-9 ] — a cheap
    mojibake / markup signal for quality scoring."""
    norm = normalize_text(c)
    bad = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", ""))
    return (bad.cast("double") / F.greatest(F.length(norm), F.lit(1)).cast("double"))


def sql_non_alnum_ratio(col: str) -> str:
    n = sql_normalize_text(col)
    return (
        f"CAST(length(regexp_replace({n}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / CAST(greatest(length({n}), 1) AS DOUBLE)"
    )


def fingerprint(c: Column | str) -> Column:
    """64-bit document fingerprint: first 16 hex chars of the MD5 of
    the normalized text. Stable across engines; the exact-dedup key
    truncated for compactness."""
    return F.substring(F.md5(normalize_text(c)), 1, 16)


def sql_fingerprint(col: str) -> str:
    return f"substring(md5({sql_normalize_text(col)}), 1, 16)"


def char_fingerprint(c: Column | str, k: int = 5) -> Column:
    """Rolling-hash document fingerprint (winnowing-style, simplified
    to global min): the minimum seeded hash over all character
    k-shingles of the normalized text. A near-duplicate *signal* the
    whole-text hash can't give: two documents collide iff they share
    their minimum-hashed shingle (P = shingle-set Jaccard), e.g.
    under appends/truncations. Built on functions/hashing.py."""
    from .hashing import char_shingles, stable_md5

    sh = char_shingles(normalize_text(c), k=k)
    return F.array_min(F.transform(sh, lambda x: stable_md5(x, seed=0)))


def sql_char_fingerprint(col: str, k: int = 5) -> str:
    n = sql_normalize_text(col)
    sh = (
        f"list_transform(generate_series(1, greatest(length({n})-{k - 1}, 1)), "
        f"i -> substring({n}, i, {k}))"
    )
    return f"list_min(list_transform({sh}, x -> md5('0|' || x)))"


# ---------------------------------------------------------------------
# language ID (stopword-ratio heuristic)
# ---------------------------------------------------------------------


def lang_id(c: Column | str) -> Column:
    """Predict a language code from stopword hit-ratios: the language
    (alphabetical tie-break) with the highest ratio, or ``'und'``
    when no list matches at all. A deliberately simple, deterministic
    heuristic — the real signal at scale is the same shape with
    bigger lists / char n-gram profiles."""
    n_tok = F.greatest(F.size(tokens(c)), F.lit(1)).cast("double")
    ratios = {lang: stopword_count(c, lang).cast("double") / n_tok for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    out = F.lit("und")
    # first (alphabetical) language reaching the max wins; fold from
    # the last backward so earlier WHENs take precedence
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when((best > 0) & (ratios[lang] == best), F.lit(lang)).otherwise(out)
    return out


def sql_lang_id(col: str) -> str:
    n_tok = f"CAST(greatest(len({sql_tokens(col)}), 1) AS DOUBLE)"
    ratios = {
        lang: f"(CAST({sql_stopword_count(col, lang)} AS DOUBLE) / {n_tok})"
        for lang in STOPWORDS
    }
    best = "greatest(" + ", ".join(ratios.values()) + ")"
    clauses = " ".join(
        f"WHEN {best} > 0 AND {ratios[lang]} = {best} THEN '{lang}'"
        for lang in sorted(STOPWORDS)
    )
    return f"CASE {clauses} ELSE 'und' END"


# ---------------------------------------------------------------------
# quality scoring (Gopher-style rule flags)
# ---------------------------------------------------------------------


def quality_flags(c: Column | str) -> dict[str, Column]:
    """Rule-based quality signals (shape of the published Gopher /
    C4 filters): token-count bounds, mean token length bounds,
    symbol-to-token ratio. Returns named boolean columns so callers
    can aggregate pass-rates or filter."""
    c = F.col(c) if isinstance(c, str) else c
    n_tok = token_count(c)
    norm_len = F.length(normalize_text(c)).cast("double")
    # chars excluding the (n_tok - 1) separating spaces, per token
    mean_tok_len = (norm_len - (n_tok - F.lit(1)).cast("double")) / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    return {
        "n_tokens_ok": (n_tok >= 5) & (n_tok <= 100000),
        "tok_len_ok": (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0),
        "symbols_ok": non_alnum_ratio(c) <= 0.1,
    }


def sql_quality_flags(col: str) -> dict[str, str]:
    n_tok = sql_token_count(col)
    norm_len = f"CAST(length({sql_normalize_text(col)}) AS DOUBLE)"
    mean_tok_len = (
        f"(({norm_len}) - CAST(({n_tok}) - 1 AS DOUBLE))"
        f" / CAST(greatest({n_tok}, 1) AS DOUBLE)"
    )
    return {
        "n_tokens_ok": f"(({n_tok}) >= 5 AND ({n_tok}) <= 100000)",
        "tok_len_ok": f"(({mean_tok_len}) >= 2.0 AND ({mean_tok_len}) <= 12.0)",
        "symbols_ok": f"(({sql_non_alnum_ratio(col)}) <= 0.1)",
    }
