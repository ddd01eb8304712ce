"""Uniform-grid binned aggregation — the reference's flagship pipeline.

Reference semantics (agg.py): prune to (x, y, value) columns
(agg.py:143), prescale the value (``Data /= 10``, agg.py:145), assign
each row to a uniform grid cell (``numpy.digitize(col, bins) - 1``
against materialized bin arrays, agg.py:131-132,149-151), group by
the cell and aggregate with ``mean | median | max`` (agg.py:153-154,
mode whitelist agg.py:265-266), then emit bin *centers* instead of
ids (``bins[i] + step/2``, agg.py:156-159) and drop the ids
(agg.py:160).

Spark-first rebuild:

- **Closed-form binning.** ``floor((x - lo) / step)`` replaces the
  digitize-against-array (identical result for uniform bins —
  SURVEY.md §2.2) — no driver-side 2M/4M-entry bin arrays, pure
  codegen-able arithmetic, and the whole map side stays in one
  WholeStageCodegen span.
- **One shuffle.** The plan is scan → project → partial hash-agg →
  exchange on the bin ids → final agg → project centers. ``mean`` and
  ``max`` use partial aggregation (map-side combine); ``median`` is
  exact (``F.median``) and necessarily holds per-group values, which
  is the correct trade — the grid is the shrink step, groups are
  small.
- **Deterministic numerics.** ``mean``/``sum`` go through
  decimal-exact sums (functions/exact.py) so results are identical
  under any partitioning — required for oracle hashing, desirable at
  100 TB where task order is never stable.
- **Out-of-range rows are dropped** (filter pushed into the scan).
  The reference *wraps* below-range values into the last cell via
  negative indexing — a documented bug (SURVEY.md §2.2) we do not
  reproduce.

Scale: output cardinality = number of non-empty cells, bounded by the
grid — the aggregation is a pure reduction, so 100 TB in → at most
|grid| rows out. Skewed cells only affect ``median`` (value lists);
AQE skew handling plus a finer grid are the mitigations.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import exact_avg, exact_sum

#: aggregation modes: the reference's {mean, median, max}
#: (agg.py:265-266) plus natural extensions.
AGG_MODES = ("mean", "median", "max", "min", "sum", "count")


@dataclass(frozen=True)
class BinSpec:
    """One binned dimension: uniform bins of width ``step`` starting
    at ``lo``; rows outside [lo, hi) are dropped. ``out`` names the
    emitted bin-center column (default ``{col}_bin``)."""

    col: str
    lo: float
    hi: float
    step: float
    out: str | None = None

    @property
    def out_col(self) -> str:
        return self.out or f"{self.col}_bin"

    def bin_id(self) -> Column:
        # closed-form digitize for uniform bins (SURVEY.md P3)
        return F.floor((F.col(self.col).cast("double") - F.lit(self.lo)) / F.lit(self.step))

    def bin_center(self, id_col: str) -> Column:
        # bins[i] + step/2 without the bins array (SURVEY.md P4)
        return (F.col(id_col).cast("double") + F.lit(0.5)) * F.lit(self.step) + F.lit(self.lo)

    def in_range(self) -> Column:
        c = F.col(self.col).cast("double")
        return (c >= F.lit(self.lo)) & (c < F.lit(self.hi))


def _agg_expr(mode: str, val_col: str) -> Column:
    if mode == "mean":
        return exact_avg(val_col)
    if mode == "median":
        return F.median(val_col)  # exact; linear interpolation on even counts
    if mode == "max":
        return F.max(val_col)
    if mode == "min":
        return F.min(val_col)
    if mode == "sum":
        return exact_sum(val_col)
    if mode == "count":
        return F.count(val_col)
    raise ValueError(f"mode must be one of {AGG_MODES}, got {mode!r}")


def binned_agg(
    df: DataFrame,
    specs: list[BinSpec],
    val_col: str,
    mode: str = "median",
    prescale: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """N-dimensional uniform-grid binned aggregation.

    Returns one row per non-empty grid cell with the bin-center
    columns (named per spec) and the aggregated value (named
    ``out_col``, default ``{val_col}_{mode}``).

    ``prescale`` divides the value column first (the reference's
    ``JDS = Data / 10``, agg.py:145).
    """
    if mode not in AGG_MODES:
        raise ValueError(f"mode must be one of {AGG_MODES}, got {mode!r}")
    out_col = out_col or f"{val_col}_{mode}"

    work = df
    if prescale is not None:
        work = work.withColumn(val_col, F.col(val_col) / F.lit(float(prescale)))

    id_cols: list[str] = []
    for spec in specs:
        work = work.filter(spec.in_range())
        idc = f"__bin_{spec.col}"
        work = work.withColumn(idc, spec.bin_id())
        id_cols.append(idc)

    # round 15: median's partial_percentile does NOT reduce — its
    # buffers carry every value through the exchange anyway — and a
    # single-row-group input scans as ONE task, so the whole buffer
    # build serialized. Hash-distribute the raw rows on the bin key
    # instead: the groupBy reuses that exchange (guide §2.4), the
    # percentile build runs one wave wide, and no second row-move is
    # paid (same shuffled bytes — values moved as rows, not buffers).
    # Measured at sf0.1: binned_agg_median_2d 1.03 s → 0.67 s.
    # Reducing modes keep the partial-agg-then-tiny-exchange shape:
    # their map side collapses to ≤|grid| rows, and round-robining
    # the input first measurably HURT the small-scan cases (extra
    # exchange, nothing to amortize — binned_agg_mean_1d 0.25 s →
    # 0.34 s), so it stays out. Results are partitioning-invariant by
    # construction (exact decimal sums / exact interpolating
    # percentile).
    narrow = work.select(*id_cols, val_col)
    if mode == "median":
        narrow = narrow.repartition(*id_cols)
    out = narrow.groupBy(*id_cols).agg(_agg_expr(mode, val_col).alias(out_col))
    for idc, spec in zip(id_cols, specs):
        out = out.withColumn(spec.out_col, spec.bin_center(idc))
    return out.select(*[s.out_col for s in specs], out_col)


# --- geo wrapper: the reference's exact surface -------------------------

EARTH_RADIUS_M = 6_371_000.0  # agg.py:31


def meters_to_degrees(meters: float) -> float:
    """Grid size in meters → degrees of latitude (agg.py:87-94)."""
    return meters / (2.0 * 3.141592653589793 * EARTH_RADIUS_M) * 360.0


def geo_aggregate(
    df: DataFrame,
    grid_meters: float = 10.0,
    mode: str = "median",
    lat_col: str = "Latitude",
    lon_col: str = "Longitude",
    val_col: str = "Data",
    prescale: float | None = 10.0,
) -> DataFrame:
    """The reference's geo pipeline (agg.py §3.2): lat/lon grid of
    ``grid_meters`` cells (longitude step equals latitude step,
    "ignoring latitude" — agg.py:131-132), value prescaled by 10,
    ``mean|median|max`` aggregate, bin-center output named like the
    input columns. Out-of-range coordinates are dropped (documented
    deviation from the reference's wraparound bug)."""
    step = meters_to_degrees(grid_meters)
    out = binned_agg(
        df,
        [
            BinSpec(lat_col, -90.0, 90.0, step, out=lat_col),
            BinSpec(lon_col, -180.0, 180.0, step, out=lon_col),
        ],
        val_col,
        mode=mode,
        prescale=prescale,
        out_col=val_col,
    )
    # reference output column order: (Data, Latitude, Longitude) — agg.py:153-160
    return out.select(val_col, lat_col, lon_col)
