"""Cross-engine stable hashing & shingling primitives.

Dedup / fingerprinting operators need hash functions that (a) run
JVM-side in Spark, (b) have bit-identical equivalents in ANSI-ish SQL
engines (the DuckDB oracle), and (c) distribute uniformly. MD5-as-hex
satisfies all three: Spark ``md5()`` and DuckDB ``md5()`` both return
the lowercase hex digest of the UTF-8 bytes, and lexicographic order
on the hex string is a uniform random order — exactly what MinHash
needs (min over a random permutation).

Seeded family: ``md5(seed || '|' || s)`` gives k independent hash
functions from one primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_md5(c: Column | str, seed: int | None = None) -> Column:
    """Lowercase-hex MD5 of a string column; optional integer seed
    prefixes the input (independent hash per seed).

    DuckDB mirror: ``md5(s)`` / ``md5(CONCAT('<seed>|', s))``.
    """
    c = F.col(c) if isinstance(c, str) else c
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.md5(c)


def let_bound(c: Column, body) -> Column:
    """Evaluate ``c`` ONCE per row and pass the value into ``body``.

    Implemented as ``transform(array(c), v -> body(v))[1]`` — the
    lambda variable is a materialized value, so expressions inside
    ``body`` (including nested higher-order lambdas) reference it
    without re-evaluating ``c``'s subtree. This matters because HOF
    lambdas re-evaluate captured *expressions* per element: e.g.
    ``transform(seq, i -> substr(norm_expr, i, k))`` over a 400-char
    string runs the normalization regex 400× per row without the
    binding (measured: 19× slowdown on text_stats_documents)."""
    return F.element_at(F.transform(F.array(c), body), 1)


def char_shingles(c: Column | str, k: int = 5) -> Column:
    """Array of all overlapping character k-grams of a string (at
    least one shingle even for short strings — mirrors
    ``substring(s, i, k)`` for i in 1..max(len-k+1, 1)).

    DuckDB mirror:
    ``SELECT substring(s, i, k) FROM t, generate_series(1, greatest(length(s)-k+1, 1)) g(i)``.
    """
    c = F.col(c) if isinstance(c, str) else c

    def shingle(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(k - 1), F.lit(1)))
        return F.transform(idx, lambda i: s.substr(i, F.lit(k)))

    return let_bound(c, shingle)


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (whitespace tokenization, space-joined).

    Built from the char-free path: split on ``\\s+`` then join
    sliding windows. DuckDB mirror uses ``regexp_split_to_array`` +
    ``generate_series`` + ``array_to_string(list_slice(...), ' ')``.
    """
    c = F.col(c) if isinstance(c, str) else c

    def shingle(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))

    return let_bound(F.split(c, r"\s+"), shingle)
