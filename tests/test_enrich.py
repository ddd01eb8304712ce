"""Enrichment operator tests — broadcast-lookup fast path and the
gated per-row resolver parity path (reference add_country.py:115-128)."""

from __future__ import annotations

from hz_csv2parquet_spark.operators.enrich import add_column_via_resolver, add_lookup_column


def test_lookup_sentinel_on_miss(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id int, v double")
    lookup = spark.createDataFrame([(1, "one"), (2, "two")], "id int, name string")
    out = add_lookup_column(df, lookup, on=["id"], value_col="name", default="No country")
    got = {r.id: r.name for r in out.collect()}
    assert got == {1: "one", 2: "two", 3: "No country"}


def test_resolver_happy_path(spark):
    df = spark.createDataFrame([(10.0, 20.0), (30.0, 40.0)], "Latitude double, Longitude double")
    out = add_column_via_resolver(
        df, ["Latitude", "Longitude"], lambda lat, lon: f"C{int(lat + lon)}"
    )
    got = sorted(r.Country for r in out.collect())
    assert got == ["C30", "C70"]


def test_resolver_exception_yields_sentinel(spark):
    """Pin the reference's "No country"-on-exception semantics
    (add_country.py:122-124): a throwing resolver must not fail the
    job — the row gets the sentinel."""

    def resolver(lat, lon):
        if lat > 0:
            raise RuntimeError("geocoder down")
        return "Atlantis"

    df = spark.createDataFrame([(1.0, 2.0), (-1.0, 2.0)], "Latitude double, Longitude double")
    out = add_column_via_resolver(df, ["Latitude", "Longitude"], resolver)
    got = {r.Latitude: r.Country for r in out.collect()}
    assert got == {1.0: "No country", -1.0: "Atlantis"}


def test_resolver_empty_result_yields_sentinel(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "Latitude double, Longitude double")
    out = add_column_via_resolver(df, ["Latitude", "Longitude"], lambda a, b: "")
    assert out.collect()[0].Country == "No country"


def test_resolver_does_not_mutate_input_schema(spark):
    """StructType.add mutates in place; the operator must build a
    fresh schema so the input df's cached schema is untouched."""
    df = spark.createDataFrame([(1.0, 2.0)], "Latitude double, Longitude double")
    before = [f.name for f in df.schema.fields]
    add_column_via_resolver(df, ["Latitude"], lambda a: "x")
    after = [f.name for f in df.schema.fields]
    assert before == after == ["Latitude", "Longitude"]
