"""Deterministic, order-insensitive numeric aggregates.

Distributed double-precision SUM/AVG are order-dependent (partial
aggregation order differs run to run and engine to engine). For
results that must hash-match a single-threaded oracle — and for
reproducible pipelines at 100 TB, where task order is never stable —
we route sums through DECIMAL(38,10):

    per-row expression evaluated in double (deterministic given the
    row) → cast to decimal (fixed-point, well-defined rounding) →
    SUM over decimals (exact, associative, commutative) → cast back
    to double (deterministic).

The decimal sum stays inside whole-stage codegen on the JVM; the cost
over a double sum is small and buys bit-identical results under any
partitioning. DuckDB mirror:
``CAST(CAST(SUM(CAST(expr AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)`` —
the VARCHAR hop matters: DuckDB's direct DECIMAL→DOUBLE cast
double-rounds (int128 → double, then the scale divide), which is 1
ulp off Spark's correctly-rounded BigDecimal.doubleValue for sums
whose unscaled value exceeds 2^53; decimal→string→double is
correctly rounded in both engines.

Conversion semantics (pinned by the partitioning-invariance property
test): Spark's double→decimal cast goes through the SHORTEST decimal
representation (``BigDecimal.valueOf``, i.e. Python ``repr``), not
the double's exact binary expansion — 4194304.38556613 becomes
4194304.3855661300, where the exact expansion would quantize to
…1303 — and rounds HALF_UP at the scale boundary (exact ties exist:
dyadic doubles like 2^-11 tie at the 11th decimal digit). Both
properties are measured, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,10)"

# SQL fragments for oracle mirroring (keep in sync with the Column fns)
SQL_EXACT_SUM = "CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
SQL_EXACT_AVG = "CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT({expr})"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: Column | str) -> Column:
    """Order-insensitive SUM of a double expression (see module doc)."""
    return F.sum(_col(c).cast(_DEC)).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, divided in
    double — identical on any engine for identical inputs."""
    c = _col(c)
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)
