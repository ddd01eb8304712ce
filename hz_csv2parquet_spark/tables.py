"""Fixture-table access for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under an ``sf_dir`` such as ``/root/testdata/sf0.01``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
# rejects under schema inference. An explicit schema with ts as LONG reads
# the raw nanos without touching any session conf (the round-1 version
# mutated spark.sql.legacy.parquet.nanosAsLong session-globally).
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan → Catalyst gets full
    pushdown/pruning on anything layered on top."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # rebuild a microsecond timestamp from the nanos (integer
        # division — nanos ≈ 1.7e18 exceeds double's exact range).
        df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def spread(df: DataFrame) -> DataFrame:
    """Repartition a too-coarse input before CPU-bound per-row work
    (per-shingle hashing, regex tokenization). A single-row-group
    parquet scans as ONE task; shuffling the raw rows is cheap
    relative to the compute it parallelizes. No-op when the input
    already spans enough files — on a real multi-file corpus this
    never fires.

    The coarseness probe is ``inputFiles()`` (a listing already cached
    by the scan relation) for file-backed plans — NOT
    ``df.rdd.getNumPartitions()``, whose Python-RDD conversion
    re-triggers plan analysis on every call, needless overhead in a
    helper every text query goes through. Non-file plans (in-memory
    ranges in tests) fall back to a single JVM-side partition count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        return df.repartition(target) if len(files) < target else df
    n = df._jdf.rdd().getNumPartitions()
    return df.repartition(target) if n < target else df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
