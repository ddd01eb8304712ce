"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hz_csv2parquet_spark`` package; this
module only adapts the query catalog (hz_csv2parquet_spark/queries.py)
to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hz_csv2parquet_spark.queries import REGISTRY, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    binned-aggregation pipeline (agg.py §3.2) — 2-D uniform grid,
    exact median — on the lineitem fixture."""
    return REGISTRY["binned_agg_median_2d"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    extension operators). Callables take (spark, sf_dir). Ordered so
    queries that most need a driver CORRECTNESS row come first (the
    driver verifies a capped prefix of this dict)."""
    return {name: q.fn for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return {name: q.sql for name, q in ordered_registry().items() if q.sql is not None}
