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
    [0, 2^bits) first — higher bits are ignored by construction.
    The two-column special case of :func:`morton_key_n` (identical
    bit layout — the ``zorder_key_events`` DuckDB oracle mirrors
    this exact formula)."""
    return morton_key_n([a, b], bits=bits)


def morton_key_n(cols: list[Column], bits: int | None = None) -> Column:
    """K-dimensional Morton interleave (OPTIMIZE ZORDER BY k columns):
    bit ``i`` of column ``j`` lands at position ``i*k + (k-1-j)`` —
    round-robin interleaving, earlier columns in the higher bit of
    each round. ``bits`` defaults to ``min(16, 63 // k)`` so the key
    always fits a signed 64-bit long; callers clamp/bucket each
    dimension into ``[0, 2^bits)`` first. Pure shifts/masks —
    whole-stage codegen, no UDF, at any k."""
    k = len(cols)
    if k < 2:
        raise ValueError("morton_key_n takes at least two columns")
    if bits is None:
        bits = min(16, 63 // k)
    if k * bits > 63:
        raise ValueError(f"{k} columns x {bits} bits overflow a 64-bit key")
    z: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            p = F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * k + (k - 1 - j))
            )
            z = p if z is None else z + p
    return z
