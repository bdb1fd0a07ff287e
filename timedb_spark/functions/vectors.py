"""Vector primitives for embedding operators.

Determinism convention: float32 embedding components are quantized to
round(x * 1e6) BIGINTs before any arithmetic. Integer dot products and
norms are exact and order-independent (safe under Spark partial aggregation
AND bit-equal to the DuckDB oracle); the only floating-point steps are one
sqrt + one division at the end.

All primitives are built-in array expressions (zip_with / aggregate) —
JVM-side, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint> of round(x*1e6)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine from quantized integers: one double division over exact ints.

    norms multiply as doubles *after* sqrt to avoid int64 overflow
    (norm_sq ~ 6e13 → product would overflow; sqrt first keeps it ~8e6)."""
    return dot_q(a, b) / (F.sqrt(norm_sq_q(a).cast("double")) * F.sqrt(norm_sq_q(b).cast("double")))


#: DuckDB twins (format with the two quantized-list expressions).
DOT_Q_SQL = "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"


def cosine_q_sql(a: str, b: str) -> str:
    dot = DOT_Q_SQL.format(a=a, b=b)
    na = DOT_Q_SQL.format(a=a, b=a)
    nb = DOT_Q_SQL.format(a=b, b=b)
    return f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))))"


QUANTIZE_SQL = "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
