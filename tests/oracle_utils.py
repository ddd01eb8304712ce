"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a catalog query through Spark and its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column names,
and values order-insensitively (columns sorted by name, rows sorted
by all columns) — the same shape as the driver's CORRECTNESS gate,
but with exact value comparison so any drift is caught early.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hz_csv2parquet_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        dt = out[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            out[c] = out[c].astype("float64")
        elif str(dt).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[ns]")
        elif dt == object:
            # duckdb may hand back Decimal objects
            sample = out[c].dropna()
            if len(sample) and type(sample.iloc[0]).__name__ == "Decimal":
                out[c] = out[c].astype("float64")
    out = out[sorted(out.columns)]
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} (spark) != {len(b)} (oracle)"
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c].dtype):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            bad = [
                i
                for i, (x, y) in enumerate(zip(av, bv))
                if not (x == y or (math.isnan(x) and math.isnan(y)))
            ]
            assert not bad, (
                f"{name}.{c}: {len(bad)} mismatches; first at row {bad[0]}: "
                f"{av[bad[0]]!r} vs {bv[bad[0]]!r} (diff {av[bad[0]] - bv[bad[0]]!r})"
            )
        else:
            neq = a[c] != b[c]
            neq &= ~(a[c].isna() & b[c].isna())
            assert not neq.any(), (
                f"{name}.{c}: {int(neq.sum())} mismatches; first: "
                f"{a[c][neq].iloc[0]!r} vs {b[c][neq].iloc[0]!r}"
            )
