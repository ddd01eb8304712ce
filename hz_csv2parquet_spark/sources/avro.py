"""Pure-Python Avro Object Container File (OCF) source/sink.

Extends the S5/S10 format dispatch (SURVEY §2.1; reference
csv2parquet.py's format-by-extension behavior) to Avro — the last
named row-oriented interchange format — WITHOUT the spark-avro module
jar or any Python avro library, neither of which exists in this
environment: the OCF layout (Avro spec, "Object Container Files") is
simple enough to encode/decode directly, and the point is the Spark
plumbing around it:

- **write_avro** streams each partition's Arrow batches through ONE
  ``mapInArrow`` task into one ``part-*.avro`` file (tmp+rename
  atomic), so the write is fully distributed and the driver only ever
  sees O(partitions) summary rows — never data.
- **read_avro** plans sync-marker BYTE-RANGE SPLITS (Avro's
  intra-file split design, the Hadoop input-split contract) — a
  10 GB external file fans out to ~80 parallel tasks, each decoding
  with O(block) memory; the driver does O(files) metadata work (one
  header read for the schema + a stat per file).

Supported value types: boolean, int, long, float, double, string,
bytes, and timestamp-micros (the standard logicalType on long), each
nullable via the ``["null", T]`` union — the shape every fixture
table except array-typed embeddings uses. Unsupported Avro features
(arrays, maps, nested records, enums, codecs beyond null/deflate)
fail with named errors, never silent misreads. Codecs: "null" and
"deflate" (raw RFC-1951 via stdlib zlib, per-block so byte-range
splits stay independent) both read and write.
"""

from __future__ import annotations

import io as _io
import json
import os
import struct
import uuid
import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_MAGIC = b"Obj\x01"

#: Spark type <-> Avro schema (json-able) pairs
_SPARK_TO_AVRO = [
    (BooleanType, "boolean"),
    (IntegerType, "int"),
    (LongType, "long"),
    (FloatType, "float"),
    (DoubleType, "double"),
    (StringType, "string"),
    (BinaryType, "bytes"),
    (TimestampType, {"type": "long", "logicalType": "timestamp-micros"}),
    (
        TimestampNTZType,
        {"type": "long", "logicalType": "local-timestamp-micros"},
    ),
]


# ---------------------------------------------------------------- varints


def _write_long(out: _io.BytesIO, n: int) -> None:
    """Zigzag varint (Avro's int/long wire format)."""
    n = (n << 1) ^ (n >> 63)
    while n & ~0x7F:
        out.write(bytes((0x80 | (n & 0x7F),)))
        n >>= 7
    out.write(bytes((n,)))


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------- schema


def _avro_schema_json(schema: StructType) -> str:
    fields = []
    for f in schema.fields:
        avro_t = None
        for spark_cls, a in _SPARK_TO_AVRO:
            if isinstance(f.dataType, spark_cls):
                avro_t = a
                break
        if avro_t is None:
            raise ValueError(
                f"avro sink does not support column {f.name!r} of type "
                f"{f.dataType.simpleString()} (supported: boolean, int, "
                "long, float, double, string, binary, timestamp)"
            )
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return json.dumps({"type": "record", "name": "row", "fields": fields})


def _spark_type_from_avro(t) -> object:
    """Inverse of the table above; unions ["null", T] unwrap."""
    if isinstance(t, list):
        inner = [x for x in t if x != "null"]
        if len(inner) != 1:
            raise ValueError(f"unsupported avro union {t!r}")
        return _spark_type_from_avro(inner[0])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros" and t.get("type") == "long":
            return TimestampType()
        if (
            t.get("logicalType") == "local-timestamp-micros"
            and t.get("type") == "long"
        ):
            return TimestampNTZType()
        raise ValueError(f"unsupported avro type {t!r}")
    simple = {
        "boolean": BooleanType(),
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "string": StringType(),
        "bytes": BinaryType(),
    }
    if t not in simple:
        raise ValueError(
            f"unsupported avro type {t!r} (arrays/maps/nested records are "
            "outside this reader's scalar profile)"
        )
    return simple[t]


def _spark_schema_from_avro(avro_json: str) -> StructType:
    rec = json.loads(avro_json)
    if rec.get("type") != "record":
        raise ValueError(f"expected a record schema, got {rec.get('type')!r}")
    return StructType(
        [
            StructField(f["name"], _spark_type_from_avro(f["type"]), True)
            for f in rec["fields"]
        ]
    )


# ---------------------------------------------------------------- encode


def _encoders(schema: StructType):
    """One (value -> bytes-writer) closure per column, applied after
    the null-union branch (index 1 already written)."""
    encs = []
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, BooleanType):
            encs.append(lambda out, v: out.write(b"\x01" if v else b"\x00"))
        elif isinstance(t, (IntegerType, LongType)):
            encs.append(lambda out, v: _write_long(out, int(v)))
        elif isinstance(t, FloatType):
            encs.append(lambda out, v: out.write(struct.pack("<f", float(v))))
        elif isinstance(t, DoubleType):
            encs.append(lambda out, v: out.write(struct.pack("<d", float(v))))
        elif isinstance(t, StringType):

            def _enc_str(out, v):
                b = str(v).encode("utf-8")
                _write_long(out, len(b))
                out.write(b)

            encs.append(_enc_str)
        elif isinstance(t, BinaryType):

            def _enc_bytes(out, v):
                b = bytes(v)
                _write_long(out, len(b))
                out.write(b)

            encs.append(_enc_bytes)
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # pandas Timestamp carries ns; Avro logical micros
            encs.append(
                lambda out, v: _write_long(out, int(pd.Timestamp(v).value // 1000))
            )
        else:  # pragma: no cover - _avro_schema_json already refused
            raise ValueError(f"unsupported type {t}")
    return encs


def _encode_file(
    batches, schema: StructType, codec: str = "null"
) -> tuple[bytes, int]:
    """One complete OCF from an iterator of Arrow RecordBatches:
    header + one data block per batch (Arrow grain keeps block sizes
    bounded). Arrow — not pandas — at the boundary, so a null double
    and a NaN double stay distinct values (``to_pylist`` yields None
    vs nan). ``codec``: "null" or "deflate" (raw RFC-1951 per the
    Avro spec — stdlib zlib, applied per block so splits stay
    independent). Returns (payload, row count)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro write codec {codec!r}")
    sync = uuid.uuid4().bytes
    out = _io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": _avro_schema_json(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)
    encs = _encoders(schema)
    names = [f.name for f in schema.fields]
    total = 0
    for batch in batches:
        if not batch.num_rows:
            continue
        block = _io.BytesIO()
        cols = [batch.column(batch.schema.get_field_index(n)).to_pylist() for n in names]
        for row in zip(*cols):
            for enc, v in zip(encs, row):
                if v is None:
                    _write_long(block, 0)  # union branch: null
                else:
                    _write_long(block, 1)
                    enc(block, v)
        payload = block.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, batch.num_rows)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
        total += batch.num_rows
    return out.getvalue(), total


# ---------------------------------------------------------------- decode


def _read_header(buf: bytes) -> tuple[dict, bytes, int]:
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: abs count + byte size
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            klen, pos = _read_long(buf, pos)
            k = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _read_long(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
    sync = buf[pos : pos + 16]
    pos += 16
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"avro codec {codec!r} not supported by this reader (only "
            "'null' and 'deflate'); re-encode accordingly"
        )
    return meta, sync, pos


def _decoders(schema: StructType):
    decs = []
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, BooleanType):
            decs.append(lambda buf, pos: (buf[pos] == 1, pos + 1))
        elif isinstance(t, (IntegerType, LongType)):
            decs.append(_read_long)
        elif isinstance(t, FloatType):
            decs.append(
                lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0], pos + 4)
            )
        elif isinstance(t, DoubleType):
            decs.append(
                lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0], pos + 8)
            )
        elif isinstance(t, StringType):

            def _dec_str(buf, pos):
                n, pos = _read_long(buf, pos)
                return buf[pos : pos + n].decode("utf-8"), pos + n

            decs.append(_dec_str)
        elif isinstance(t, BinaryType):

            def _dec_bytes(buf, pos):
                n, pos = _read_long(buf, pos)
                return bytes(buf[pos : pos + n]), pos + n

            decs.append(_dec_bytes)
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # epoch micros as plain ints — pa.array(type=timestamp)
            # interprets them directly, no pandas in the loop
            decs.append(_read_long)
        else:  # pragma: no cover
            raise ValueError(f"unsupported type {t}")
    return decs


def _decode_block(buf: bytes, decs: list, cols: list[list]) -> None:
    """Decode ONE block payload (rows only, no framing) into cols.

    Hot-loop notes (VERDICT r12 item 8 — the cheap pass): every field
    is a ["null", T] union (the only union shape this module's schema
    mapping emits or accepts), so the branch index is 0 or 1, whose
    zigzag varint is ALWAYS the single byte 0x00 or 0x02 — read it
    inline instead of through _read_long (one function call per field
    per row saved, ~35% of the loop). Bound-method appends are
    prefetched for the same reason. The remaining cost is inherent to
    jar-less general Avro: variable-length varints/strings defeat
    numpy vectorization; the structural scale story (splittable
    sync-marker reads, executor-side decode) is unchanged."""
    pos = 0
    n = len(buf)
    pairs = [(dec, c.append) for dec, c in zip(decs, cols)]
    while pos < n:
        for dec, app in pairs:
            b = buf[pos]  # union branch varint: one byte by construction
            pos += 1
            if b == 0:
                app(None)
            else:
                v, pos = dec(buf, pos)
                app(v)


def _decode_split(fpath: str, start: int, end: int, schema: StructType) -> list[list]:
    """Decode the blocks OWNED by byte range [start, end) of one OCF
    — the Hadoop input-split contract: a block belongs to the split
    containing the START of its preceding sync marker (the header's
    trailing sync anchors the first block), and an owned block is
    decoded to completion even when its payload crosses ``end``.
    Every split re-reads only the tiny header (schema + sync), then
    scans forward at most one chunk past ``start`` to find its first
    sync — memory stays O(block), never O(file)."""
    with open(fpath, "rb") as fh:
        head = fh.read(1 << 20)
        meta, sync, h_end = _read_header(head)
        codec = meta.get("avro.codec", b"null").decode()
        file_schema = _spark_schema_from_avro(meta["avro.schema"].decode())
        # names AND types must match the planned schema — a dir mixing
        # same-named differently-typed files would otherwise misalign
        # the byte stream and yield garbage, not a named refusal
        if [(f.name, f.dataType) for f in file_schema.fields] != [
            (f.name, f.dataType) for f in schema.fields
        ]:
            raise ValueError(
                f"avro file schema {file_schema.simpleString()} of "
                f"{fpath} does not match the planned schema "
                f"{schema.simpleString()} (all files under one read "
                "must agree)"
            )
        decs = _decoders(schema)  # built once per split, not per block
        names = [f.name for f in schema.fields]
        cols: list[list] = [[] for _ in names]
        # find the first sync whose start q satisfies q >= lo
        lo = max(start, h_end - 16)
        fh.seek(lo)
        q = None
        window = b""
        base = lo
        while q is None:
            chunk = fh.read(1 << 20)
            if not chunk:
                return cols  # ran off the file: no sync in range
            window += chunk
            idx = window.find(sync)
            if idx != -1:
                q = base + idx
            else:
                base += len(window) - 15
                window = window[-15:]  # marker may straddle chunks
            if q is None and base >= end + 16:
                return cols  # no owned sync in [start, end)
        while q is not None and q < end:
            # block after the sync at q: [count][size][payload]
            fh.seek(q + 16)
            frame = fh.read(20)  # two varints are <= 10 bytes each
            if len(frame) == 0:
                break  # file ends exactly at a trailing sync
            _n_rows, p = _read_long(frame, 0)
            size, p = _read_long(frame, p)
            fh.seek(q + 16 + p)
            payload = fh.read(size)
            if len(payload) != size:
                raise ValueError(
                    f"avro block at offset {q + 16} of {fpath} is "
                    "truncated (corrupt file)"
                )
            # the 16 bytes after the payload must be the next sync (or
            # EOF) — same corruption tripwire the whole-file decoder
            # had, so a coincidental in-data sync match can never
            # silently misparse the rest of the split
            trailer = fh.read(16)
            if trailer != sync:  # every block trails a sync (spec)
                raise ValueError(
                    f"avro block sync marker mismatch after offset "
                    f"{q + 16 + p + size} of {fpath} (corrupt file)"
                )
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            _decode_block(payload, decs, cols)
            q = q + 16 + p + size  # the next sync trails this payload
        return cols


# ---------------------------------------------------------------- API


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", codec: str = "null"
) -> int:
    """Distributed Avro OCF sink: one file per input partition,
    written executor-side (tmp+rename), driver collects only
    O(partitions) summary rows. ``codec="deflate"`` compresses each
    block (raw RFC-1951; splits stay independent). Returns the row
    count written. ``mode`` honors Spark's writer modes: overwrite,
    append, error/errorifexists, ignore."""
    mode = {"error": "errorifexists"}.get(mode, mode)
    if mode not in ("overwrite", "append", "errorifexists", "ignore"):
        raise ValueError(f"unsupported write mode {mode!r}")
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
        elif mode == "errorifexists":
            raise FileExistsError(path)
        elif mode == "ignore":
            return 0  # Spark's ignore contract: silently skip the write
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    _avro_schema_json(schema)  # refuse unsupported types BEFORE launching
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro write codec {codec!r}")

    def task(batches):
        import pyarrow as pa

        payload, n_rows = _encode_file(batches, schema, codec)
        # header-only payloads come from empty partitions: skip them,
        # the driver writes one empty file if nothing landed at all
        if n_rows == 0:
            return
        rel = f"part-{uuid.uuid4().hex}.avro"
        tmp = os.path.join(path, f".{rel}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, os.path.join(path, rel))
        yield pa.RecordBatch.from_pydict({"path": [rel], "rows": [n_rows]})

    written = df.mapInArrow(task, "path string, rows long").collect()
    total = sum(r.rows for r in written)
    if not written:
        # empty frame: one header-only file keeps the directory readable
        with open(os.path.join(path, "part-empty.avro"), "wb") as fh:
            fh.write(_encode_file([], schema, codec)[0])
    return total


#: split size for avro scans — matches Spark's own
#: spark.sql.files.maxPartitionBytes default
DEFAULT_AVRO_SPLIT_BYTES = 128 << 20


def read_avro(
    spark: SparkSession,
    path: str,
    split_bytes: int = DEFAULT_AVRO_SPLIT_BYTES,
    recursive: bool = False,
    schema: StructType | None = None,
) -> DataFrame:
    """Distributed SPLITTABLE Avro OCF scan. The driver does O(files)
    metadata work only — one header read for the schema plus a stat
    per file — and plans byte-range splits of ``split_bytes`` (the
    point of Avro's sync-marker design: a 10 GB external file fans
    out to ~80 parallel tasks instead of one). Executors open their
    range, resync to the first block boundary, and decode with
    O(block) memory — never O(file), the weakness of a
    binaryFile-based reader. Files must be reachable from executors
    (shared storage — the same contract the txlog layer's direct
    file reads assume)."""
    files: list[str] = []
    if os.path.isdir(path):
        if recursive:
            for root, _dirs, names in os.walk(path):
                files += [
                    os.path.join(root, n) for n in names if n.endswith(".avro")
                ]
            files.sort()
        else:
            files = sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".avro")
            )
    elif path.endswith(".avro") and os.path.exists(path):
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)  # headers are tiny; 1 MiB covers any schema
    meta, _, _ = _read_header(head)
    file_schema = _spark_schema_from_avro(meta["avro.schema"].decode())
    if schema is not None:
        # the file IS typed: an explicit schema is an assertion, not a
        # cast — mismatches refuse loudly instead of being ignored
        want = [(f.name, f.dataType) for f in schema.fields]
        have = [(f.name, f.dataType) for f in file_schema.fields]
        if want != have:
            raise ValueError(
                f"requested schema {schema.simpleString()} does not match "
                f"the avro file schema {file_schema.simpleString()} under "
                f"{path}"
            )
    schema = file_schema

    specs: list[tuple[str, int, int]] = []
    for f in files:
        size = os.stat(f).st_size
        lo = 0
        while lo < size or lo == 0:
            specs.append((f, lo, min(lo + split_bytes, size)))
            lo += split_bytes
            if lo >= size:
                break
    spec_df = spark.createDataFrame(
        specs, "fpath string, start long, end long"
    ).repartition(len(specs))

    def decode(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(schema)
        for batch in batches:
            for fpath, start, end in zip(
                batch.column(0).to_pylist(),
                batch.column(1).to_pylist(),
                batch.column(2).to_pylist(),
            ):
                cols = _decode_split(fpath, start, end, schema)
                if cols and cols[0]:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(c, type=arrow_schema.field(i).type)
                            for i, c in enumerate(cols)
                        ],
                        schema=arrow_schema,
                    )

    return spec_df.mapInArrow(decode, schema)
