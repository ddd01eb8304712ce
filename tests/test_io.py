"""Sources/sinks: CSV→Parquet conversion round-trip, format dispatch,
recursive discovery, suffix naming (SURVEY.md §2.1)."""

from __future__ import annotations

import os

import pytest

from hz_csv2parquet_spark.sources.io import (
    add_suffix_to_path,
    convert,
    read_table,
    write_table,
)

CSV_BODY = "a, b,c\n1, x,2.5\n2, y,3.5\n"


@pytest.fixture()
def csv_tree(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "top.csv").write_text(CSV_BODY)
    (tmp_path / "sub" / "nested.CSV").write_text(CSV_BODY)  # mixed-case ext
    return tmp_path


def test_convert_roundtrip(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(CSV_BODY)
    dest = convert(spark, str(src))
    assert dest.endswith("in.parquet")
    back = spark.read.parquet(dest)
    assert back.count() == 2
    # header parsed, leading whitespace trimmed, types inferred
    assert set(back.columns) == {"a", "b", "c"}
    row = {r["a"]: r for r in back.collect()}
    assert row[1]["b"] == "x"
    assert row[1]["c"] == 2.5


def test_recursive_case_insensitive_discovery(spark, csv_tree):
    df = read_table(spark, str(csv_tree), fmt="csv", recursive=True)
    assert df.count() == 4  # both .csv and .CSV found


def test_format_dispatch_and_sinks(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(CSV_BODY)
    df = read_table(spark, str(src))  # fmt inferred from extension
    pq_dest = str(tmp_path / "out.parquet")
    csv_dest = str(tmp_path / "out.csv")
    write_table(df, pq_dest)
    write_table(df, csv_dest)
    assert read_table(spark, pq_dest).count() == 2
    assert read_table(spark, csv_dest).count() == 2
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "in.xlsx"))


def test_json_roundtrip_and_dispatch(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(CSV_BODY)
    df = read_table(spark, str(src))
    dest = str(tmp_path / "out.jsonl")
    write_table(df, dest)  # fmt inferred: .jsonl → json lines
    back = read_table(spark, dest, schema=df.schema)
    assert back.count() == 2
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_orc_roundtrip_and_dispatch(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(CSV_BODY)
    df = read_table(spark, str(src))
    dest = str(tmp_path / "out.orc")
    write_table(df, dest)  # fmt inferred: .orc
    back = read_table(spark, dest)
    assert back.count() == 2
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_suffix_naming_no_double_dot(tmp_path):
    # reference bug (add_country.py:79) produced 'b_x..csv' — fixed here
    assert add_suffix_to_path("a/b.csv", "_x") == "a/b_x.csv"
    assert add_suffix_to_path("a/b", "_x") == "a/b_x"


def test_spread_is_noop_when_parallel_enough(spark):
    from hz_csv2parquet_spark.tables import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target)
    assert spread(wide) is wide  # same object: no shuffle inserted
    narrow = spark.range(1000).coalesce(1)
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 1000


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    """The compaction op's file-count contract: fragmented input has
    many part files, the compacted output exactly one, and no rows
    are lost — the data-level mirror is compact_small_files' oracle."""
    import glob as g

    from hz_csv2parquet_spark.tables import table

    frag, compact = str(tmp_path / "frag"), str(tmp_path / "compact")
    table(spark, sf_dir, "supplier").repartition(16).write.parquet(frag)
    n_before = len(g.glob(frag + "/part-*"))
    spark.read.parquet(frag).coalesce(1).write.parquet(compact)
    n_after = len(g.glob(compact + "/part-*"))
    assert n_before > 1 and n_after == 1
    assert spark.read.parquet(compact).count() == table(spark, sf_dir, "supplier").count()


def test_csv_scan_is_permissive_on_malformed_rows(spark, tmp_path):
    """At 100 TB some malformed rows are a certainty: the CSV scan
    must null-fill bad cells (Spark's default PERMISSIVE mode), not
    fail the job — the reference's pandas reader has the same
    keep-going behavior (low_memory chunking)."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,10.5\n2,notanumber\n3,30.25\n")
    df = spark.read.option("header", True).schema("k long, v double").csv(str(p))
    rows = {r.k: r.v for r in df.collect()}
    assert rows[1] == 10.5 and rows[3] == 30.25
    assert rows[2] is None  # malformed cell null-filled, row kept


def test_corrupt_parquet_files_can_be_skipped(spark, sf_dir, tmp_path):
    """At 100 TB a corrupt file in a million-file table is a
    certainty. Default behavior must FAIL LOUDLY (no silent data
    loss); with spark.sql.files.ignoreCorruptFiles the scan must
    skip the bad file and return every healthy row."""
    import shutil

    from hz_csv2parquet_spark.tables import table

    d = str(tmp_path / "mixed")
    table(spark, sf_dir, "supplier").coalesce(1).write.parquet(d)
    (tmp_path / "mixed" / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a real file")
    n_good = table(spark, sf_dir, "supplier").count()

    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(d).count()  # loud by default

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(d).count() == n_good
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_compact_small_files_leaves_big_file(spark, sf_dir, tmp_path):
    """The selectivity contract behind the compact_small_files
    catalog query: same build (one right-sized file + a fragmented
    append), same bin-packing pass — the original file's add entry
    must SURVIVE the compaction commit (rewrites cost O(appended),
    not O(table)) and no row may be lost."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.sources.txlog import TxTable
    from hz_csv2parquet_spark.tables import table

    sup = table(spark, sf_dir, "supplier")
    t = TxTable(spark, str(tmp_path / "tbl"), stat_cols=["s_suppkey"])
    t.create(sup.filter(F.col("s_suppkey") % 4 != 0).coalesce(1))
    big_rel = set(t._replay_state()["adds"])
    t.append(sup.filter(F.col("s_suppkey") % 4 == 0).repartition(4))
    n = sup.count()
    t.compact(max_file_rows=max(2, n // 2))
    adds_after = set(t._replay_state()["adds"])
    assert big_rel <= adds_after          # the big file was never rewritten
    assert len(adds_after) <= len(big_rel) + 1  # fragments -> one file
    assert t.snapshot().count() == n


def test_avro_roundtrip_and_dispatch(spark, tmp_path):
    """S5/S10 extended to Avro OCF (round 12) via the hand-rolled
    wire-format codec (sources/avro.py — no spark-avro jar or Python
    avro lib in this environment): extension dispatch, distributed
    mapInArrow encode/decode, value-exact roundtrip."""
    src = tmp_path / "in.csv"
    src.write_text(CSV_BODY)
    df = read_table(spark, str(src))
    dest = str(tmp_path / "out.avro")
    write_table(df, dest)  # fmt inferred: .avro
    back = read_table(spark, dest)
    assert back.count() == 2
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_avro_preserves_null_vs_nan_and_types(spark, tmp_path):
    """The Arrow boundary keeps a NULL double and a NaN double
    distinct (a pandas-based codec could not); timestamps roundtrip
    at micro precision; unsupported types and codecs fail with named
    errors."""
    import math

    import pytest as _pytest

    from hz_csv2parquet_spark.sources.avro import read_avro, write_avro

    df = spark.createDataFrame(
        [
            (1, 0.5, True, "héllo", bytearray(b"\x00\xff")),
            (2, float("nan"), None, None, None),
            (None, None, False, "", bytearray(b"")),
        ],
        "a long, b double, c boolean, s string, bin binary",
    )
    out = str(tmp_path / "mixed_avro")
    assert write_avro(df, out) == 3
    rows = {r.a: r for r in read_avro(spark, out).collect()}
    assert math.isnan(rows[2].b) and rows[None].b is None
    assert rows[1].bin == bytearray(b"\x00\xff") and rows[None].bin == bytearray(b"")
    assert rows[1].s == "héllo" and rows[None].s == ""
    # arrays are outside the scalar profile: named refusal, not a misread
    emb = spark.createDataFrame([(1, [0.5, 0.25])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="does not support column 'v'"):
        write_avro(emb, str(tmp_path / "emb_avro"))


def test_avro_reads_are_splittable(spark, tmp_path):
    """Sync-marker byte-range splits (the point of Avro's OCF
    design): a file fans out to multiple tasks, each task owns the
    blocks whose preceding sync STARTS inside its range, and rows
    are globally exactly-once at ANY split granularity — even splits
    smaller than one block."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.sources.avro import read_avro, write_avro

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("text-"), F.col("id")).alias("s"),
    )
    out = str(tmp_path / "split_avro")
    write_avro(df.repartition(2), out)
    expected = {(r.k, r.s) for r in df.collect()}
    for split in (10_000, 1_000, None):
        back = read_avro(spark, out, **({"split_bytes": split} if split else {}))
        assert {(r.k, r.s) for r in back.collect()} == expected, f"split={split}"


def test_avro_deflate_codec_roundtrip(spark, tmp_path):
    """The deflate codec (raw RFC-1951, the Avro spec's standard
    compression) roundtrips value-exact — compressed per block, so
    byte-range splits decode independently; unknown codecs still
    refuse with a named error."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.sources.avro import read_avro, write_avro

    df = spark.range(1500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("compressible text "), F.col("id") % 7).alias("s"),
    )
    out = str(tmp_path / "deflate_avro")
    write_avro(df.repartition(2), out, codec="deflate")
    expected = {(r.k, r.s) for r in df.collect()}
    assert {(r.k, r.s) for r in read_avro(spark, out).collect()} == expected
    # tiny splits still decode exactly-once (compression is per block)
    got = read_avro(spark, out, split_bytes=2_000)
    assert {(r.k, r.s) for r in got.collect()} == expected
    import glob as _glob
    import os as _os

    deflated = sum(_os.stat(f).st_size for f in _glob.glob(out + "/*.avro"))
    out_null = str(tmp_path / "null_avro")
    write_avro(df.repartition(2), out_null)
    plain = sum(_os.stat(f).st_size for f in _glob.glob(out_null + "/*.avro"))
    assert deflated < plain  # it actually compressed
    with pytest.raises(ValueError, match="codec"):
        write_avro(df, str(tmp_path / "bad"), codec="snappy")


def test_avro_read_refuses_mixed_type_dirs_and_honors_modes(spark, tmp_path):
    """Round-12 self-review fixes: (1) a directory mixing same-named
    differently-typed avro files refuses with a named error instead
    of misaligning the byte stream; (2) writer modes follow Spark's
    contract — 'error' refuses on existing output, 'ignore' no-ops,
    'append' adds; (3) an explicit read schema is validated against
    the file header; (4) recursive discovery walks nested dirs."""
    from pyspark.sql import functions as F

    from hz_csv2parquet_spark.sources.avro import read_avro, write_avro

    d = str(tmp_path / "mixed_types")
    write_avro(spark.createDataFrame([(1,)], "x long"), d)
    write_avro(spark.createDataFrame([(2.5,)], "x double"), d, mode="append")
    with pytest.raises(Exception, match="does not match the planned schema"):
        read_avro(spark, d).collect()

    out = str(tmp_path / "modes")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert write_avro(df, out) == 1
    with pytest.raises(FileExistsError):
        write_avro(df, out, mode="error")
    assert write_avro(df, out, mode="ignore") == 0  # skipped, not written
    assert read_avro(spark, out).count() == 1
    assert write_avro(df, out, mode="append") == 1
    assert read_avro(spark, out).count() == 2
    with pytest.raises(ValueError, match="unsupported write mode"):
        write_avro(df, out, mode="bogus")

    # explicit schema is an assertion against the typed file
    ok = read_table(spark, out, fmt="avro", schema="k long, s string")
    assert ok.count() == 2
    with pytest.raises(ValueError, match="does not match the avro file schema"):
        read_table(spark, out, fmt="avro", schema="k double, s string")

    # recursive discovery
    nest = tmp_path / "nest" / "inner"
    nest.mkdir(parents=True)
    write_avro(df, str(nest / "leaf_avro"))
    got = read_table(spark, str(tmp_path / "nest"), fmt="avro", recursive=True)
    assert got.count() == 1
    with pytest.raises(FileNotFoundError):
        read_table(spark, str(tmp_path / "nest"), fmt="avro")  # non-recursive
