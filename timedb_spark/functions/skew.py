"""Skew-mitigation primitives (SURVEY §6).

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
``session.get_spark``) handles most sort-merge skew at runtime by splitting
oversized partitions. Salting is the complementary MANUAL lever for the
cases AQE can't fix: aggregation skew (one giant group) and shuffle-hash
joins where a single key's rows must land on one reducer.

``salted_join`` spreads each hot key over ``n_salts`` reducers: the big
(probe) side gets a deterministic per-row salt, the small (build) side is
replicated once per salt value. Join cardinality and results are identical
to the plain join; the hot key's rows now flow through ``n_salts``
reducers instead of one. Cost: build side ×n_salts — use it when the build
side is modest but too big (or too skew-correlated) to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, *, n_salts: int, salt_on: str) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): a stable hash of a
    distinguishing column (NOT the join key — salting by the key alone would
    put each key's rows back on one reducer)."""
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int"))


def replicated(df: DataFrame, *, n_salts: int) -> DataFrame:
    """Build side replicated once per salt value (explode of a literal
    range; rides the scan, no shuffle of its own)."""
    return df.withColumn(SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    *,
    n_salts: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the join keys spread over ``n_salts`` reducers.

    ``salt_on`` names a big-side column whose hash distributes rows of the
    SAME key across salts (default: the first non-key column)."""
    keys = [on] if isinstance(on, str) else list(on)
    if salt_on is None:
        non_key = [c for c in big.columns if c not in keys]
        if not non_key:
            raise ValueError("salted_join needs a non-key big-side column to salt on")
        salt_on = non_key[0]
    b = with_salt(big, n_salts=n_salts, salt_on=salt_on)
    s = replicated(small, n_salts=n_salts)
    return b.join(s, on=keys + [SALT_COL], how=how).drop(SALT_COL)
