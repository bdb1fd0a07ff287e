"""Cross-engine contract of the floor-scale rounding convention
(functions/rounding.py) — the r12 review finding made executable: the
bare floor-scale form diverges on IDENTICAL non-finite/huge inputs
(Spark F.floor(double)→BIGINT: NaN→0, ±Inf→±Long.MAX, saturation past
2^63; DuckDB floor() stays DOUBLE), so both twins guard with a
pass-through. This test runs BOTH engines over the full input zoo —
ties, negatives, NaN, ±Inf, ±huge — and compares cell-for-cell."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from timedb_spark.functions.rounding import PASS_LIMIT, floor6, floor6_sql, floor_scale, floor_scale_sql

ZOO = [
    0.0, 1.0, -1.0,
    0.0000005, -0.0000005,          # exact 6-dp halfway ties
    1.2345675, -1.2345675,
    123.456789, -123.456789,
    float("nan"), float("inf"), float("-inf"),
    9.5e12, -9.5e12,                # past the BIGINT saturation edge /1e6
    2.0e12, -2.0e12,                # inside the pass-through band
    1.0e11, -1.0e11,                # below PASS_LIMIT: still floor-scaled
]


def _norm(x):
    if x is None:
        return "None"
    if isinstance(x, float) and math.isnan(x):
        return "nan"
    return repr(float(x))


@pytest.mark.parametrize("digits", [4, 6])
def test_floor_scale_zoo_cross_engine(spark, digits):
    sdf = spark.createDataFrame([(i, repr(v)) for i, v in enumerate(ZOO)], "i int, xs string")
    got = {
        r.i: _norm(r.y)
        for r in sdf.select("i", floor_scale(F.col("xs").cast("double"), digits).alias("y")).collect()
    }
    con = duckdb.connect()
    rows = ", ".join(f"({i}, '{v!r}')" for i, v in enumerate(ZOO))
    duck = {
        i: _norm(y)
        for i, y in con.execute(
            f"SELECT i, {floor_scale_sql('CAST(xs AS DOUBLE)', digits)} AS y "
            f"FROM (VALUES {rows}) t(i, xs)"
        ).fetchall()
    }
    assert got == duck


def test_floor6_literal_pins(spark):
    """Literal value pins so BOTH engines changing together still reds:
    ties floor toward +inf at the scaled integer (0.0000005*1e6+0.5=1.0
    → 1e-6; -0.0000005 → 0.0), non-finite and huge pass through."""
    vals = [0.0000005, -0.0000005, 1.5e12, float("nan")]
    sdf = spark.createDataFrame([(i, repr(v)) for i, v in enumerate(vals)], "i int, xs string")
    got = {r.i: r.y for r in sdf.select("i", floor6(F.col("xs").cast("double")).alias("y")).collect()}
    assert got[0] == 1e-06
    assert got[1] == 0.0
    assert got[2] == 1.5e12      # pass-through, NOT floored to long
    assert math.isnan(got[3])    # NOT the pre-fix 0.0
    assert PASS_LIMIT < 2**63 / 1e6             # the saturation-edge invariant


def test_r12_converted_oracles_carry_the_guard(spark):
    """Each listed oracle's R12-CONVERTED SITE (the round(x,6) pair
    rewritten this round — for the hourly-grid queries that site is the
    shared _HOURLY_SERIES_SQL avg) generates from the guarded helper
    (isnan/huge pass-through): un-guarding that site reds every consumer
    here. The claim is deliberately per-converted-site, NOT per-query
    (r12 review #2): ts_interpolate_linear / ts_holt_winters also carry
    PRE-r12 floor-scale sites in their own outputs — the grandfathered
    r6–r9 convention, whose non-finite divergence risk predates r12
    unchanged (a NaN diverged at those sites under round(x,6) too) and
    stays fenced by the multi-SF parity battery (SURVEY §7 inventory)."""
    import __spark_entry__ as entrymod

    o = entrymod.oracle_sql()
    for name in (
        "dedup_ngram_jaccard", "dedup_minhash", "dedup_embedding",
        "dedup_lsh_tuning", "dedup_semantic", "embed_outliers",
        "ts_anomaly_mad", "ts_autocorr", "ts_seasonal_naive",
        "ts_anomaly_zscore", "ts_moving_stats", "ts_resample_locf",
        "ts_interpolate_linear", "ts_holt_winters", "ts_calendar_features",
        "ts_lttb", "tpch_q2", "tpch_q11", "tpch_q16",  # q20's oracle derives availqty only — no supplycost site
        "multimodal_audio", "multimodal_decode", "text_boilerplate",
        "text_vocab",
        "embed_knn_graph",  # r13 conversion (VERDICT r12 #4, the largest residual site)
    ):
        assert "CASE WHEN isnan" in o[name], f"{name}: guard missing from oracle"


def test_sql_twin_interpolates_the_exact_guard_bound():
    """ADVICE r12: the SQL twin must carry repr(PASS_LIMIT) — the exact
    float literal the Spark twin compares — not a one-significant-digit
    format that would silently round a future non-single-digit bound
    (e.g. 9.2e12 → '9e+12') and reopen a cross-engine divergence band."""
    sql = floor6_sql("x")
    assert repr(PASS_LIMIT) in sql
    # the exact-roundtrip property the interpolation relies on
    assert float(repr(PASS_LIMIT)) == PASS_LIMIT
