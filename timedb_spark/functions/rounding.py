"""Cross-engine deterministic 6-decimal rounding.

``floor(x*1e6 + 0.5)/1e6`` on BOTH engines, never ``round(x, 6)``:
Spark's ``F.round`` is java HALF_UP on the exact decimal expansion of the
double while DuckDB's ``round()`` is double rounding — on a halfway value
(or a double whose decimal expansion straddles one) the two can differ by
1e-6. That class produced three real hash-reds at sf0.1 in r8
(text_quality / pipeline_clean / bt_backtest_error, SURVEY §7); the
floor-scale form is the same IEEE double ops on both engines, so it can
only diverge if the inputs already diverge. r12 converted the
highest-traffic remaining ``round(x, 6)`` oracle pairs to this helper
(VERDICT r11 task #5); the residual-site inventory lives in SURVEY §7 and
the multi-SF parity battery stays the detector for the rest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor6(c: Column) -> Column:
    """``floor(x*1e6 + 0.5)/1e6`` — the gate rounding convention (Spark)."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def floor6_sql(expr: str) -> str:
    """DuckDB twin of :func:`floor6` (textual SQL form)."""
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"
