"""Z-order (Morton) clustering key for multi-dimensional zone maps.

A linear ``(series_id, valid_time)`` sort gives perfect row-group pruning
on series predicates but none on time inside a series-major file (each
file spans the partition's whole time range). Interleaving the bits of
the series id and the hour index produces a space-filling-curve order in
which every contiguous run of rows — hence every row group — covers a
bounded 2-D TILE of (series, time): both the series min/max and the
valid_time min/max footer stats become selective at once, which is what a
dashboard's ``series IN (...) AND time BETWEEN ...`` scan needs. This is
the same trick as Delta's ``OPTIMIZE ... ZORDER BY`` / Iceberg's
``sort_order(zorder(...))``, expressed as a plain codegen'd column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits interleaved per dimension (16+16 → 32-bit code)
ZORDER_BITS = 16


def morton_code(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative long columns
    (a → even positions, b → odd). Pure bitwise expressions — whole-stage
    codegen, no UDF."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return code


def series_time_zorder(series_col: str = "series_id", ts_col: str = "valid_time") -> Column:
    """The store's clustering key: morton(series_id low bits, hour index
    low bits). Hour-of-epoch keeps time locality at the granularity zone
    maps act on; low-bit truncation only wraps across 2^16 series / 2^16
    hours (~7.5 years), which partitioning already separates."""
    hour_idx = F.expr(f"unix_micros({ts_col}) div 3600000000")
    return morton_code(F.col(series_col), hour_idx)
