"""Multimodal plumbing tests: schema contract, Arrow batch execution,
decode fallback, frame sampling."""

from __future__ import annotations

import os

import pytest

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


def _make_png(width: int, height: int) -> bytes:
    """Synthesize a REAL, spec-valid 8-bit greyscale PNG (signature,
    IHDR, IDAT with per-row filter bytes, IEND, correct CRCs)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((r * width + c) % 256 for c in range(width)) for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decodes_through_mapinpandas(spark):
    """A real PNG flows through the Arrow mapInPandas decode path with
    the best-available real decoder (stdlib PNG subset here, PIL when
    installed) — width/height/pixel count come from actual IHDR/IDAT
    parsing, closing the round-3 'stubbed codec' gap. A corrupt
    payload in the same batch degrades to (-1, -1, 0), not a job
    failure."""
    from hz_csv2parquet_spark.operators.multimodal import auto_decode, decode_payloads, png_decode

    png = _make_png(7, 5)
    # sanity: the decoder really parses the bytes
    d = png_decode(png)
    assert (d["width"], d["height"], len(d["pixels"])) == (7, 5, 35)
    assert d["pixels"][:3] == bytes([0, 1, 2])

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(_make_png(3, 2))), (3, bytearray(b"\x89PNG\r\n\x1a\njunk"))],
        "vid long, payload binary",
    )
    rows = {
        r.vid: (r.width, r.height, r.n_pixels)
        for r in decode_payloads(df, "vid", "payload", decoder=auto_decode).collect()
    }
    assert rows[1] == (7, 5, 35)
    assert rows[2] == (3, 2, 6)
    assert rows[3] == (-1, -1, 0)  # truncated PNG -> corrupt-row convention


def test_resize_identity_on_exact_grid(spark):
    """A 64-byte payload fake-decodes to exactly 8×8, so the 8×8
    nearest-neighbor resize must be the identity on the pixel
    buffer."""
    import hashlib

    from hz_csv2parquet_spark.operators.multimodal import resize_pixels

    payload = bytes(range(64))
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    r = resize_pixels(df, "id", "payload", out_w=8, out_h=8).collect()[0]
    assert (r.src_w, r.src_h, r.out_w, r.out_h) == (8, 8, 8, 8)
    assert r.resized_sum == sum(payload)
    assert r.resized_md5 == hashlib.md5(payload).hexdigest()


def test_resize_downsamples_row_major(spark):
    """A 16×16 gradient downsampled to 8×8 must pick every other
    pixel (floor(r·16/8)=2r, floor(c·16/8)=2c) in row-major order."""
    from hz_csv2parquet_spark.operators.multimodal import resize_pixels

    payload = bytes((r * 16 + c) % 256 for r in range(16) for c in range(16))
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    r = resize_pixels(df, "id", "payload", out_w=8, out_h=8).collect()[0]
    expected = bytes(payload[(2 * rr) * 16 + 2 * cc] for rr in range(8) for cc in range(8))
    assert r.resized_sum == sum(expected)


def test_frame_energy_matches_numpy(spark):
    """Frame boundaries, hop overlap, and the short tail frame,
    checked byte-exactly against direct numpy on known payloads."""
    import numpy as np

    from hz_csv2parquet_spark.operators.multimodal import frame_energy
    from pyspark.sql import functions as F

    payloads = [
        (1, b"a" * 300),           # frames: [0:256], [128:300] (tail 172)
        (2, b"xy"),                # one short frame
        (3, bytes(range(200)) + bytes(range(200))),  # 400 bytes
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.frame_id): (r.n_samples, r.energy)
        for r in frame_energy(df, "doc_id", "payload", 256, 128).collect()
    }
    expected = {}
    for i, p in payloads:
        arr = np.frombuffer(p, np.uint8).astype(np.int64)
        f, off = 0, 0
        while off < len(arr):
            fr = arr[off : off + 256]
            expected[(i, f)] = (len(fr), int((fr * fr).sum()))
            f, off = f + 1, off + 128
    assert got == expected


def test_dhash_bits_matches_reference_impl(spark):
    """dHash grid sampling and bit order checked against a direct
    independent recomputation on known payloads, including the w=1
    degenerate grid and a constant payload (all-zero hash)."""
    from hz_csv2parquet_spark.operators.multimodal import dhash_bits, fake_decode

    payloads = [
        (1, bytes(range(100))),        # 10×10 grid, strictly increasing rows
        (2, b"\x07" * 81),             # constant → every gradient bit 0
        (3, b"abc"),                   # tiny: w=1, h=3
        (4, bytes(reversed(range(144)))),  # 12×12, strictly decreasing
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: (r.src_w, r.src_h, r.phash) for r in dhash_bits(df, "doc_id", "payload").collect()}
    for i, p in payloads:
        d = fake_decode(p)
        w, h, px = d["width"], d["height"], d["pixels"]
        grid = [[px[(r * h // 8) * w + (c * w // 9)] for c in range(9)] for r in range(8)]
        bits = "".join(
            "1" if grid[k // 8][k % 8] > grid[k // 8][k % 8 + 1] else "0" for k in range(64)
        )
        assert got[i] == (w, h, bits), f"doc {i}"
    assert got[2][2] == "0" * 64


# ---------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py, round 13)
# ---------------------------------------------------------------------


def _gradient(w: int, h: int):
    import numpy as np

    return ((np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5) % 256).astype(
        np.uint8
    )


def test_jpeg_roundtrip_smooth_image_low_error():
    import numpy as np

    from hz_csv2parquet_spark.operators.jpeg import jpeg_decode, jpeg_encode_gray

    img = _gradient(37, 21)
    enc = jpeg_encode_gray(img.tobytes(), 37, 21, quant=4)
    d = jpeg_decode(enc)
    assert (d["width"], d["height"]) == (37, 21)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(21, 37)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: segment boundaries reset the DC predictor and
    realign the bit reader — same pixels out for every interval."""
    import numpy as np

    from hz_csv2parquet_spark.operators.jpeg import jpeg_decode, jpeg_encode_gray

    img = _gradient(41, 33)
    base = None
    for ri in (0, 1, 3, 7):
        enc = jpeg_encode_gray(img.tobytes(), 41, 33, quant=2, restart_interval=ri)
        got = np.frombuffer(jpeg_decode(enc)["pixels"], dtype=np.uint8)
        assert np.abs(got.astype(int).reshape(33, 41) - img.astype(int)).max() <= 2
        if base is None:
            base = got
        else:
            # intervals change framing, not content
            assert np.array_equal(base, got)


_SPARK_SAMPLES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_SAMPLES), reason="Spark sample images absent"
)
def test_jpeg_decodes_real_libjpeg_files():
    """Cross-validation against files WE did not encode: the
    libjpeg-produced baseline 4:2:0 sample images in the Spark
    distribution. Structure (dims, full entropy decode) must be
    exact; content sanity via natural-image smoothness — a zigzag or
    dequant error scrambles high frequencies and explodes the mean
    horizontal gradient. Decode is also pinned deterministic."""
    import hashlib

    import numpy as np

    from hz_csv2parquet_spark.operators.jpeg import jpeg_decode

    cases = [
        ("kittens/DP802813.jpg", 199, 313),
        ("multi-channel/chr30.4.184.jpg", 300, 215),
    ]
    for rel, w, h in cases:
        payload = open(os.path.join(_SPARK_SAMPLES, rel), "rb").read()
        d = jpeg_decode(payload)
        assert (d["width"], d["height"]) == (w, h)
        rgb = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
        grad = np.abs(np.diff(rgb[:, :, 0].astype(int), axis=1)).mean()
        assert grad < 30, f"{rel}: implausibly rough decode (grad={grad:.1f})"
        assert (
            hashlib.md5(d["pixels"]).hexdigest()
            == hashlib.md5(jpeg_decode(payload)["pixels"]).hexdigest()
        )


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_SAMPLES), reason="Spark sample images absent"
)
def test_jpeg_progressive_fails_closed():
    from hz_csv2parquet_spark.operators.jpeg import jpeg_decode

    payload = open(
        os.path.join(_SPARK_SAMPLES, "multi-channel/grayscale.jpg"), "rb"
    ).read()
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_decode(payload)


def test_jpeg_through_mapinpandas_with_corrupt_rows(spark):
    """auto_decode dispatches JPEG magic to the real decoder inside
    decode_payloads; truncated payloads take the (-1, -1, 0) corrupt
    row instead of failing the job."""
    from hz_csv2parquet_spark.operators.jpeg import jpeg_encode_gray
    from hz_csv2parquet_spark.operators.multimodal import auto_decode, decode_payloads

    good = jpeg_encode_gray(_gradient(16, 9).tobytes(), 16, 9)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[: len(good) // 2]))],
        "vid long, payload binary",
    )
    got = {
        r.vid: (r.width, r.height, r.n_pixels)
        for r in decode_payloads(df, "vid", "payload", decoder=auto_decode).collect()
    }
    assert got[1] == (16, 9, 144)
    assert got[2] == (-1, -1, 0)
