"""Streaming CDC apply: maintain a latest-value-per-key table from an
event stream via ``foreachBatch`` merge — the lakehouse pattern
(Delta/Iceberg ``MERGE`` inside ``foreachBatch``) on plain parquet.

Each micro-batch reduces to one upsert row per touched key (max by
event time, ties by event id — a commutative/associative merge, so
the result is independent of how the source splits into batches),
then merges into a **versioned** target directory: batch N writes
``v{N}`` from ``v{N-1}`` ∪ upserts. Versioning matters — Spark
cannot overwrite a parquet path it is lazily reading, and the
version chain is exactly a poor-man's Delta commit log (the driver
keeps only the latest pointer; compaction would prune old versions).

Scale notes: the per-batch merge is a key-partitioned shuffle of
(target ∪ batch) — at 100 TB the target would be bucketed by key so
the merge co-locates without reshuffling the full table, and only
touched partitions would rewrite (partition-overwrite mode); the
protocol here is the same, storage layout is the only difference.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame) -> DataFrame:
    """One row per (user_id, event_type): the latest (ms, event_id,
    cents) triple by lexicographic max — commutative across any batch
    split, which is what makes the incremental merge exact."""
    return (
        df.groupBy("user_id", "event_type")
        .agg(
            F.max(F.struct("last_ms", "last_event_id", "last_cents")).alias("__m")
        )
        .select("user_id", "event_type", "__m.*")
    )


def cdc_project(events: DataFrame) -> DataFrame:
    """Project the change-feed columns the merge maintains."""
    return events.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("last_ms"),
        F.col("event_id").alias("last_event_id"),
        F.round(F.col("value") * 100).cast("long").alias("last_cents"),
    )


def run_cdc_merge(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """Execute the stream to completion (availableNow), applying the
    foreachBatch merge; return the final target as a batch frame."""
    root = tempfile.mkdtemp(prefix="hz_cdc_merge_")
    state = {"v": -1}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        upserts = latest_per_key(cdc_project(batch_df))
        if state["v"] >= 0:
            cur = spark.read.parquet(os.path.join(root, f"v{state['v']}"))
            upserts = latest_per_key(cur.unionByName(upserts))
        nxt = state["v"] + 1
        upserts.write.mode("overwrite").parquet(os.path.join(root, f"v{nxt}"))
        state["v"] = nxt

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="hz_cdc_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["v"] < 0:  # empty source: no batch ever fired
        return latest_per_key(
            cdc_project(
                spark.createDataFrame(
                    [],
                    "user_id long, event_type string, ts timestamp, "
                    "event_id long, value double",
                )
            )
        )
    return spark.read.parquet(os.path.join(root, f"v{state['v']}"))
