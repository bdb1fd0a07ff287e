"""Cross-engine deterministic fixed-point rounding.

``floor(x*1eN + 0.5)/1eN`` on BOTH engines, never ``round(x, N)``:
Spark's ``F.round`` is java HALF_UP on the exact decimal expansion of the
double while DuckDB's ``round()`` is double rounding — on a halfway value
(or a double whose decimal expansion straddles one) the two can differ by
1e-N. That class produced three real hash-reds at sf0.1 in r8
(text_quality / pipeline_clean / bt_backtest_error, SURVEY §7); r12
converted the highest-traffic remaining ``round(x, 6)`` oracle pairs
(VERDICT r11 task #5); the residual-site inventory lives in SURVEY §7 and
the multi-SF parity battery stays the detector for the rest.

Non-finite and huge inputs PASS THROUGH unrounded (r12 review finding):
Spark ``F.floor(double)`` returns BIGINT — NaN→0, ±Inf→±Long.MAX,
saturation for |x·1eN| ≥ 2^63 — while DuckDB's ``floor()`` stays DOUBLE
(NaN→NaN, inf→inf), so the bare floor-scale would diverge on IDENTICAL
inputs exactly where the data goes degenerate (a 0/0 autocorrelation, an
FP-negative variance under sqrt). Both twins therefore guard with
``isnan(x) OR abs(x) > 1e12`` and return x itself: both engines emit the
same NaN/inf/huge double, and at |x| > 1e12 a 6-dp round is sub-ulp
noise anyway (2^53/1e6 ≈ 9.0e9), far below the 9.22e12 BIGINT
saturation edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Pass-through bound: far above any meaningful 4/6-dp rounding domain,
#: far below Spark's floor→BIGINT saturation edge (2^63/1e6 ≈ 9.22e12).
PASS_LIMIT = 1e12


def floor_scale(c: Column, digits: int = 6) -> Column:
    """``floor(x*1eN + 0.5)/1eN`` with the non-finite/huge pass-through —
    the gate rounding convention (Spark side). ``digits`` is capped at 6:
    PASS_LIMIT guards Spark's floor→BIGINT saturation only while
    ``PASS_LIMIT * 10^digits < 2^63`` (at digits=7 the unguarded band
    9.23e11..1e12 would reopen the divergence — r12 review)."""
    if digits > 6:
        raise ValueError(f"floor_scale supports digits <= 6 (got {digits}): PASS_LIMIT*10^digits must stay below 2^63")
    s = F.lit(float(10**digits))
    cd = c.cast("double")
    return F.when(F.isnan(cd) | (F.abs(cd) > F.lit(PASS_LIMIT)), cd).otherwise(
        F.floor(cd * s + F.lit(0.5)) / s
    )


def floor_scale_sql(expr: str, digits: int = 6) -> str:
    """DuckDB twin of :func:`floor_scale` (textual SQL form). The input
    expression is inlined three times (guard + value) — fine for oracles,
    where clarity of the shared convention beats micro-CSE."""
    if digits > 6:
        raise ValueError(f"floor_scale_sql supports digits <= 6 (got {digits})")
    e = f"CAST(({expr}) AS DOUBLE)"
    s = f"1e{digits}"
    # repr(PASS_LIMIT), not {:.0e}: a one-significant-digit format would
    # silently round a future bound like 9.2e12 to 9e+12 in the SQL twin
    # while the Spark twin compares the exact float (ADVICE r12).
    return (
        f"CASE WHEN isnan({e}) OR abs({e}) > {PASS_LIMIT!r} THEN {e} "
        f"ELSE floor({e} * {s} + 0.5) / {s} END"
    )


def floor_scale_once(c: Column, digits: int = 6) -> Column:
    """:func:`floor_scale` with the input evaluated exactly ONCE per row.

    The guard references its input four times textually (isnan / abs /
    pass-through / floor), and Catalyst's CollapseProject + predicate
    pushdown happily duplicate all four into join conditions — for an
    expensive input like a per-pair dot-product fold that multiplies the
    hot-loop cost (dedup_embedding's before-plan evaluated its fold 8×
    per candidate pair). Binding ``c`` as a one-element array-lambda
    variable pins one evaluation; the lambda body re-references only the
    bound variable. Same value, same double ops. Use for per-row folds;
    plain :func:`floor_scale` stays codegen-friendly for cheap scalars.
    """
    from timedb_spark.functions.binding import bind1

    return bind1(c, lambda x: floor_scale(x, digits))


def floor6(c: Column) -> Column:
    """6-dp :func:`floor_scale` — the most common gate precision."""
    return floor_scale(c, 6)


def floor6_once(c: Column) -> Column:
    """6-dp :func:`floor_scale_once` — for expensive (fold) inputs."""
    return floor_scale_once(c, 6)


def floor6_sql(expr: str) -> str:
    """DuckDB twin of :func:`floor6`."""
    return floor_scale_sql(expr, 6)
