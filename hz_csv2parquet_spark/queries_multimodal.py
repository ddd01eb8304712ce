"""Multimodal-plumbing query: the Arrow-batched Python path under the
hash gate.

The corpus is synthesized from ``documents`` (UTF-8 payload bytes —
the fixtures carry no real media), but the execution path is the real
one: binary column + metadata struct → ``mapInPandas`` feature
extraction (numpy over raw bytes). Because the fixture text is pure
ASCII, the byte statistics have an exact SQL mirror (codepoint = byte
value, integer sums are order-independent) — so this checks the
Python/Arrow path itself against DuckDB, not just JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import attach_payload_metadata, byte_features
from .queries import query
from .tables import table


@query(
    "multimodal_byte_features",
    sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        i -> ord(substring(text, i, 1)))) AS BIGINT)
             AS byte_sum,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        i -> ord(substring(text, i, 1)))) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS mean_byte,
           CAST(list_max(list_transform(generate_series(1, length(text)),
                                        i -> ord(substring(text, i, 1)))) AS BIGINT)
             AS max_byte
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the real
    mapInPandas/Arrow path: documents text encoded to bytes, typed
    metadata attached, numpy byte stats per payload. The integer byte
    sum makes the mean bit-stable, so the Python path hash-matches
    the SQL mirror exactly."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    d = attach_payload_metadata(d, "payload", modality="image", fmt="fake/utf8")
    feats = byte_features(d, "doc_id", "payload")
    # mean recomputed JVM-side from the exact integer sum (numpy's
    # float division is identical for sum/n; keep the contract explicit)
    return feats.select(
        "doc_id",
        "n_bytes",
        "byte_sum",
        (F.col("byte_sum").cast("double") / F.col("n_bytes").cast("double")).alias("mean_byte"),
        "max_byte",
    )
