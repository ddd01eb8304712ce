"""Lookup enrichment — the reference's add_country.py, distribution-safe.

The reference adds a ``Country`` column by issuing one OSM reverse-
geocode HTTP round-trip *per row* (add_country.py:118,128), with a
``"No country"`` sentinel on any failure (add_country.py:124). That
boundary does not survive distribution — at 100 TB it is billions of
network calls. The Spark-native re-model (SURVEY.md U1): join against
a precomputed lookup table, **broadcast** because lookups are small
dimension tables, with ``coalesce(value, sentinel)`` preserving the
miss semantics exactly.

A faithful per-row variant (Arrow-batched ``mapInPandas`` calling a
user-supplied resolver) is provided for API parity — gated, and
documented as the slow path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_lookup_column(
    df: DataFrame,
    lookup: DataFrame,
    on: list[str] | dict[str, str],
    value_col: str,
    default: str = "No country",
    out_col: str | None = None,
) -> DataFrame:
    """Left-join ``lookup`` onto ``df`` and coalesce misses to
    ``default``.

    ``on`` is either a list of shared column names or a
    ``{df_col: lookup_col}`` mapping. The lookup side is broadcast —
    no shuffle of the (large) fact side, which is the only plan that
    scales to 100 TB fact tables.
    """
    out_col = out_col or value_col
    if isinstance(on, dict):
        cond = [F.col(f"__l.{a}") == F.col(f"__r.{b}") for a, b in on.items()]
        joined = df.alias("__l").join(F.broadcast(lookup).alias("__r"), cond, "left")
        keep = [F.col(f"__l.{c}") for c in df.columns]
        return joined.select(
            *keep, F.coalesce(F.col(f"__r.{value_col}"), F.lit(default)).alias(out_col)
        )
    joined = df.join(F.broadcast(lookup), on=list(on), how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(value_col), F.lit(default)))


def add_column_via_resolver(
    df: DataFrame,
    key_cols: list[str],
    resolver: Callable[..., str],
    out_col: str = "Country",
    default: str = "No country",
) -> DataFrame:
    """Faithful per-row enrichment (reference add_country.py:115-128)
    as an Arrow-batched ``mapInPandas`` — the *slow path*, kept for
    parity with the reference's API. ``resolver(*keys) -> str`` is
    called once per row inside each Arrow batch; exceptions yield the
    sentinel (add_country.py:122-124 semantics)."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    # build a fresh StructType — StructType.add mutates in place and
    # DataFrame.schema caches the object, so df's schema would grow a
    # phantom column
    schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def safe(row: pd.Series) -> str:
                try:
                    got = resolver(*[row[k] for k in key_cols])
                    return got if got else default
                except Exception:
                    return default

            pdf[out_col] = pdf[key_cols].apply(safe, axis=1)
            yield pdf

    return df.mapInPandas(run, schema=schema)
