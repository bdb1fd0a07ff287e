"""packed_lex contract tests (VERDICT r13 what's-wrong #3 / ADVICE r13).

The packed-DECIMAL(38,0) ordering silently SKIPS rows whose components are
NULL (max_by/min_by drop null orderings) where the old struct ordering
ranked them null-first — every production call site is non-null by
construction, but nothing enforced it for future callers. The checked mode
(TIMEDB_SPARK_CHECK_PACKED / ordering.CHECK) wraps each packed key in a
per-row precondition guard; these tests pin (a) the guard fires loudly on
a NULL component and an out-of-range ``lo``, (b) checked and unchecked
modes agree on valid input, and (c) the packed key reproduces the struct
ordering exactly on representative (kt, ct) data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timedb_spark.functions import ordering


def _collect_packed(spark, rows, check: bool, monkeypatch):
    monkeypatch.setattr(ordering, "CHECK", check)
    df = spark.createDataFrame(rows, "hi long, lo long")
    return df.select(
        ordering.packed_lex(F.col("hi"), F.col("lo")).alias("k")
    ).collect()


def test_packed_lex_checked_null_component_fails_loudly(spark, monkeypatch):
    with pytest.raises(Exception, match="packed_lex precondition"):
        _collect_packed(spark, [(1, 2), (3, None)], True, monkeypatch)
    with pytest.raises(Exception, match="packed_lex precondition"):
        _collect_packed(spark, [(None, 2)], True, monkeypatch)


def test_packed_lex_checked_out_of_range_lo_fails_loudly(spark, monkeypatch):
    with pytest.raises(Exception, match="packed_lex precondition"):
        _collect_packed(spark, [(1, ordering.SCALE // 2)], True, monkeypatch)


def test_packed_lex_checked_agrees_with_unchecked_on_valid_input(spark, monkeypatch):
    rows = [(5, -4_999_999_999_999_999_999), (0, 0), (-3, 17), (2**60, 2**58)]
    unchecked = _collect_packed(spark, rows, False, monkeypatch)
    checked = _collect_packed(spark, rows, True, monkeypatch)
    assert [r.k for r in checked] == [r.k for r in unchecked]


def test_packed_lex_reproduces_struct_order(spark):
    # representative (kt, ct) micros pairs incl. negative epochs and ties
    rows = [
        (1_700_000_000_000_000, 1),
        (1_700_000_000_000_000, -5),
        (1_700_000_000_000_001, -(10**18)),
        (-62_135_596_800_000_000, 10**18),
        (0, 0),
        (0, 1),
    ]
    df = spark.createDataFrame(rows, "hi long, lo long")
    by_struct = [
        (r.hi, r.lo)
        for r in df.orderBy(F.struct("hi", "lo")).collect()
    ]
    by_packed = [
        (r.hi, r.lo)
        for r in df.orderBy(ordering.packed_lex(F.col("hi"), F.col("lo"))).collect()
    ]
    assert by_struct == by_packed
