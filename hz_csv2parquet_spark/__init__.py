"""hz_csv2parquet_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the capabilities of the reference
``hziv/hz_csv2parquet`` toolkit (CSV→Parquet conversion, uniform-grid
binned aggregation, lookup enrichment — see SURVEY.md §2), extended
with the operators a large-scale training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
edit-distance / embedding cosine), similarity search (brute force /
sign-LSH / IVF / Arrow pandas_udf), text analysis, repetition/quality
gating, deterministic sampling + sharding, sequence packing, int8
quantization, multimodal column plumbing, and Structured Streaming
(windows, stateful ops, exactly-once dedup, stream-static joins).

Design principles (SURVEY.md §7):

- Declarative DataFrame/SQL plans; let Catalyst do pushdown, pruning,
  join selection, and AQE do runtime re-planning.
- No custom Catalyst rules — every reference operator compiles to
  built-in expressions (closed-form binning replaces materialized
  numpy bin arrays, broadcast joins replace per-row HTTP geocoding).
- Deterministic, order-insensitive numerics where results feed the
  correctness oracle (decimal-exact sums, exact median).
- JVM-side expressions in the hot path; Arrow-batched pandas UDFs
  only where built-ins cannot express the semantics.
"""

__version__ = "0.2.0"

from .operators.asof import asof_join
from .operators.binned_agg import BinSpec, binned_agg, geo_aggregate
from .operators.dedup import (
    blocked_jaccard_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    simhash64_frame,
    simhash_near_pairs,
)
from .operators.enrich import add_lookup_column
from .operators.packing import pack_assignment, salted_sum
from .operators.repetition import repetition_stats
from .operators.sampling import deterministic_sample, shard_assign
from .operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
    embedding_near_pairs,
    ivf_topk,
    lsh_topk,
)
from .operators.topk import grouped_topk
from .sources.io import convert, read_table, write_table
from .sources.txlog import CommitConflictError, TxTable
from .sources.txlog_source import register_txlog_source
from .streaming.dedup import dedup_within_watermark

__all__ = [
    "BinSpec",
    "TxTable",
    "CommitConflictError",
    "register_txlog_source",
    "binned_agg",
    "geo_aggregate",
    "asof_join",
    "exact_dedup",
    "minhash_dedup_pairs",
    "simhash64_frame",
    "simhash_near_pairs",
    "blocked_jaccard_pairs",
    "add_lookup_column",
    "pack_assignment",
    "salted_sum",
    "repetition_stats",
    "deterministic_sample",
    "shard_assign",
    "dedup_within_watermark",
    "brute_force_topk",
    "brute_force_topk_pandas",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_pairs",
    "grouped_topk",
    "convert",
    "read_table",
    "write_table",
]
