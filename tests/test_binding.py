"""functions/binding.bind1 — the r14 HOF duplicate-evaluation fix.

Catalyst inlines derived columns into every textual reference, including
into HOF lambda bodies where they re-evaluate per array element (HOFs are
CodegenFallback: no common-subexpression elimination). ``bind1`` pins one
evaluation by passing the expression as a lambda-bound variable. These
tests pin BOTH halves of that contract: value equivalence (bit-identical
to the unbound form, non-finite inputs included) and the structural
guarantee (exactly one copy of the bound expression in the optimized
plan, however many times the body references it).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timedb_spark.functions.binding import bind1
from timedb_spark.functions.rounding import floor6, floor6_once

ZOO = [
    0.0, 1.0, -1.0, 0.0000005, -0.0000005, 1.2345675, -1.2345675,
    123.456789, -123.456789, float("nan"), float("inf"), float("-inf"),
    9.5e12, -9.5e12, 2.0e12, 1.0e11, None,
]


def _norm(x):
    if x is None:
        return "None"
    if isinstance(x, float) and math.isnan(x):
        return "nan"
    return repr(float(x))


def test_bind1_value_identity(spark):
    """bind1(c, f) == f(c) cell-for-cell over the non-finite zoo."""
    sdf = spark.createDataFrame(
        [(i, repr(v) if v is not None else None) for i, v in enumerate(ZOO)],
        "i int, xs string",
    )
    c = F.col("xs").cast("double")
    f = lambda x: x * 2.0 + F.abs(x)  # noqa: E731 — references x twice
    rows = sdf.select("i", f(c).alias("plain"), bind1(c, f).alias("bound")).collect()
    assert {r.i: _norm(r.plain) for r in rows} == {r.i: _norm(r.bound) for r in rows}


def test_floor6_once_matches_floor6(spark):
    """floor6_once is floor6 with a pinned input — same values, ties,
    pass-through band and NaN/Inf behavior."""
    sdf = spark.createDataFrame(
        [(i, repr(v) if v is not None else None) for i, v in enumerate(ZOO)],
        "i int, xs string",
    )
    c = F.col("xs").cast("double")
    rows = sdf.select("i", floor6(c).alias("a"), floor6_once(c).alias("b")).collect()
    assert {r.i: _norm(r.a) for r in rows} == {r.i: _norm(r.b) for r in rows}


def test_bind1_single_evaluation_in_optimized_plan(spark):
    """The reason bind1 exists: an expensive fold referenced 5× appears
    ONCE in the optimized plan when bound (Catalyst cannot substitute
    through a lambda-bound variable) vs 5× inlined when not."""
    sdf = spark.range(3).select(F.array(F.col("id"), F.col("id") + 1).alias("a"))
    fold = F.aggregate("a", F.lit(0).cast("long"), lambda acc, x: acc + x)

    def quad(x):  # five textual references, like the floor-scale guard
        return F.when(x > 0, x * 2).when(x < 0, -x).otherwise(x)

    def n_folds(col):
        plan = (
            sdf.select(col.alias("y"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return plan.count("aggregate(")

    assert n_folds(quad(fold)) == 5      # the disease
    assert n_folds(bind1(fold, quad)) == 1  # the fix


def test_shingles_binds_its_tokens_expression(spark):
    """shingles(split(...)) must not re-split the document at every
    shingle position: exactly one split( in the optimized plan."""
    from timedb_spark.functions.texttools import shingles

    sdf = spark.createDataFrame([("a b c d e f g",)], "text string")
    plan = (
        sdf.select(shingles(F.split(F.col("text"), " "), 3).alias("sh"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1
    got = sdf.select(shingles(F.split(F.col("text"), " "), 3).alias("sh")).collect()[0].sh
    assert got == ["a b c", "b c d", "c d e", "d e f", "e f g"]
