"""Sources & sinks (SURVEY.md §2.1, S1–S11).

Re-expresses the reference's pandas file I/O as Spark readers/writers:

- S1/S2  CSV scan (full / projected)  — header+inferSchema+trimmed
  delimiters (reference: ``read_csv(..., skipinitialspace=True)``,
  csv2parquet.py:75, agg.py:53).
- S3/S4  Parquet scan (full / projected) — add_country.py:50, agg.py:55.
  Projection is a ``select``; Catalyst pushes pruning into the scan.
- S5     format dispatch by extension  — agg.py:47-61.
- S6/S7  recursive & wildcard discovery — csv2parquet.py:85, agg.py:178.
  Spark expands globs natively; ``recursiveFileLookup`` covers ``**``.
- S8/S9/S10 parquet/CSV/format-preserving sinks — csv2parquet.py:77,
  agg.py:64-77.
- S11    suffixed output naming — agg.py:80-84 (the reference's
  add_country.py:79 double-dot bug is deliberately NOT reproduced).

Scale notes: one multi-path read replaces the reference's thread-pool
over files (csv2parquet.py:43-60) — Spark's scheduler parallelizes
within and across files, and a 100 TB directory is just more tasks.
Schema inference samples the data; at scale callers should pass an
explicit ``schema`` to make the read single-pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CSV_EXTS = {".csv"}
_PARQUET_EXTS = {".parquet", ".pq"}
_JSON_EXTS = {".json", ".jsonl", ".ndjson"}
_ORC_EXTS = {".orc"}
_AVRO_EXTS = {".avro"}


def _infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/*"))[1].lower()
    if ext in _CSV_EXTS:
        return "csv"
    if ext in _PARQUET_EXTS:
        return "parquet"
    if ext in _JSON_EXTS:
        return "json"
    if ext in _ORC_EXTS:
        return "orc"
    if ext in _AVRO_EXTS:
        return "avro"
    raise ValueError(f"cannot infer format from {path!r}; pass fmt=")


def read_table(
    spark: SparkSession,
    path: str | list[str],
    fmt: str | None = None,
    columns: list[str] | None = None,
    schema: StructType | str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read CSV or Parquet into a DataFrame (S1–S7).

    ``path`` may be a file, a directory, a glob, or a list of any of
    those — Spark expands all of them into one distributed scan.
    ``columns`` projects (Catalyst prunes into the file reader).
    ``recursive`` enables ``**``-style discovery for directories (S6).
    """
    first = path[0] if isinstance(path, list) else path
    fmt = fmt or _infer_format(first)
    paths = path if isinstance(path, list) else [path]

    if fmt == "csv":
        reader = (
            spark.read.option("header", True)
            .option("ignoreLeadingWhiteSpace", True)  # skipinitialspace parity
            .option("ignoreTrailingWhiteSpace", True)
        )
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        if recursive:
            # case-insensitive *.csv discovery (reference globs with
            # case_sensitive=False, csv2parquet.py:85)
            reader = reader.option("recursiveFileLookup", True).option(
                "pathGlobFilter", "*.[cC][sS][vV]"
            )
        df = reader.csv(paths)
    elif fmt == "parquet":
        reader = spark.read
        if recursive:
            reader = reader.option("recursiveFileLookup", True)
        df = reader.parquet(*paths)
    elif fmt == "json":
        # JSON Lines — the lingua franca of LLM corpus interchange.
        # Pass an explicit schema at scale: inference is a full extra
        # pass over the data.
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if recursive:
            reader = reader.option("recursiveFileLookup", True).option(
                "pathGlobFilter", "*.[jJ][sS][oO][nN]*"
            )
        df = reader.json(paths)
    elif fmt == "orc":
        # ORC — the other columnar interchange format (Hive/Trino
        # ecosystems); same pushdown/pruning story as parquet.
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if recursive:
            reader = reader.option("recursiveFileLookup", True)
        df = reader.orc(*paths)
    elif fmt == "avro":
        # Avro OCF — the row-oriented interchange format; this
        # environment ships neither spark-avro nor a Python avro
        # lib, so sources/avro.py decodes OCF in executor-side
        # mapInArrow tasks over the binaryFile source. Column
        # pruning happens post-decode (no pushdown) — the documented
        # tradeoff of the hand-rolled scalar-profile codec.
        from .avro import read_avro

        if len(paths) != 1:
            raise ValueError("avro read takes exactly one directory/file path")
        if isinstance(schema, str):
            from pyspark.sql.types import StructType as _St

            schema = _St.fromDDL(schema)
        df = read_avro(spark, paths[0], recursive=recursive, schema=schema)
    else:
        raise ValueError(f"unsupported format {fmt!r}")

    if columns:
        df = df.select(*columns)
    return df


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a DataFrame as Parquet or CSV (S8–S10). No index column
    exists to drop — Spark DataFrames are pure relations.

    ``partition_by`` produces a Hive-style ``col=value/`` directory
    layout — the 100 TB default for any column readers filter on
    (partition pruning skips whole directories at plan time)."""
    fmt = fmt or _infer_format(path)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "avro":
        if partition_by:
            raise ValueError("avro sink does not support partitionBy")
        from .avro import write_avro

        write_avro(df, path, mode=mode)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def convert(
    spark: SparkSession,
    src: str,
    dest: str | None = None,
    schema: StructType | str | None = None,
    recursive: bool = False,
) -> str:
    """CSV→Parquet conversion — the whole of the reference's
    csv2parquet.py (249 lines) as one lazy read→write pipeline.

    Returns the destination path. ``dest`` defaults to the source
    with a ``.parquet`` extension (file) or ``<src>_parquet`` (dir).
    """
    if dest is None:
        root, ext = os.path.splitext(src)
        dest = root + ".parquet" if ext else src.rstrip("/") + "_parquet"
    df = read_table(spark, src, fmt="csv", schema=schema, recursive=recursive)
    write_table(df, dest, fmt="parquet")
    return dest


def add_suffix_to_path(path: str, suffix: str) -> str:
    """Suffixed-output naming (S11): ``a/b.csv`` + ``_x`` → ``a/b_x.csv``.

    Fixes the reference's double-dot bug (add_country.py:79 produces
    ``b_x..csv``); behavior matches the correct agg.py:80-84 variant.
    """
    root, ext = os.path.splitext(path)
    return f"{root}{suffix}{ext}"


def convert_streaming(
    spark, src_dir: str, dest: str, schema, fmt: str = "csv"
) -> None:
    """Incremental conversion: the reference's csv2parquet tool as a
    Structured Streaming job. New files landing in ``src_dir`` are
    discovered by the file source and appended to the parquet sink
    with exactly-once semantics (checkpointed file index) — the
    deployment shape when the input is a landing zone, not a static
    directory. ``availableNow`` drains everything present and stops,
    so the same code serves both backfill and continuous tails.

    Streaming file sources require an explicit ``schema`` (no
    inference on an unbounded input — cite: Spark structured
    streaming guide)."""
    stream = (
        spark.readStream.schema(schema)
        .format(fmt)
        .option("header", "true")
        .load(src_dir)
    )
    (
        stream.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", dest + "_checkpoint")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
