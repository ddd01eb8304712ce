"""Multimodal plumbing tests: schema contract, Arrow batch execution,
decode fallback, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from hz_csv2parquet_spark.operators.multimodal import (
    attach_payload_metadata,
    byte_features,
    decode_payloads,
    fake_decode,
    frame_sample,
)


def _corpus(spark):
    rows = [(1, b"\x00\x01\x02\x03" * 64), (2, b"\xff" * 10), (3, b"a")]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_metadata_struct(spark):
    df = attach_payload_metadata(_corpus(spark), "payload", "image", "raw")
    meta = {r.id: r.meta for r in df.collect()}
    assert meta[1].modality == "image" and meta[1].n_bytes == 256
    assert meta[3].n_bytes == 1


def test_byte_features_values(spark):
    got = {r.id: r for r in byte_features(_corpus(spark), "id", "payload").collect()}
    assert got[1].n_bytes == 256 and got[1].byte_sum == 64 * 6 and got[1].max_byte == 3
    assert got[2].byte_sum == 2550 and got[2].mean_byte == 255.0
    assert got[3].byte_sum == 97


def test_decode_fallback_on_corrupt_payload(spark):
    def decoder(payload: bytes):
        if len(payload) < 4:
            raise ValueError("truncated")
        return fake_decode(payload)

    got = {r.id: r for r in decode_payloads(_corpus(spark), "id", "payload", decoder).collect()}
    assert got[1].width == 16 and got[1].height == 16 and got[1].n_pixels == 256
    assert got[3].width == -1 and got[3].n_pixels == 0  # corrupt → sentinel row


def test_frame_sample_indices_and_bytes(spark):
    df = spark.createDataFrame([(1, bytes(range(256)))], "id long, payload binary")
    frames = {r.frame_id: bytes(r.frame) for r in frame_sample(df, "id", "payload", frame_bytes=64, every=2).collect()}
    assert sorted(frames) == [0, 2]  # 4 frames, keep every 2nd
    assert frames[0] == bytes(range(64))
    assert frames[2] == bytes(range(128, 192))


def test_frame_sample_empty_payload_emits_no_rows(spark):
    # a zero-length payload has zero frames — no phantom frame_id 0
    # (the DuckDB mirror emits no rows for empty text; must match)
    df = spark.createDataFrame([(1, b""), (2, bytes(range(64)))], "id long, payload binary")
    rows = frame_sample(df, "id", "payload", frame_bytes=64, every=2).collect()
    assert [(r.id, r.frame_id) for r in rows] == [(2, 0)]


def test_byte_features_distributed_partitions(spark):
    # many partitions → many Arrow batches; results identical
    df = _corpus(spark).repartition(8)
    assert byte_features(df, "id", "payload").count() == 3
