"""Z-order (Morton) clustering key — the multi-dimensional layout
primitive behind OPTIMIZE ZORDER BY (SURVEY E115).

``morton_key`` interleaves the low bits of two integer dimensions
into one sort key: writing files range-clustered on that key gives
every file a quad-tree-cell-shaped footprint in (a, b) space, so
min/max footer stats stay selective for range predicates on EITHER
dimension — two-column data skipping from a one-column layout. The
interleave is pure shifts/masks (whole-stage codegen, no UDF).

Shared by the ``zorder_key_events`` catalog query (which oracles the
key computation against a DuckDB bit-arithmetic mirror) and the
transaction-log compaction demo (``TxTable.compact(layout_key=...)``
over a Morton column, tests/test_txlog.py) — the key a maintenance
job would compute before a layout rewrite."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of ``a`` (odd positions) and
    ``b`` (even positions): z = Σ_i ((a>>i & 1) << (2i+1)) |
    ((b>>i & 1) << 2i). Callers clamp/bucket the dimensions into
    [0, 2^bits) first — higher bits are ignored by construction."""
    z: Column | None = None
    for i in range(bits):
        pa = F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        pb = F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = pa + pb if z is None else z + pa + pb
    return z
