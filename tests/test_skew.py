"""salted_join (SURVEY §6): result-equivalence with the plain join on a
deliberately skewed key distribution, and the partition-spread property the
salt exists for."""

from pyspark.sql import functions as F

from timedb_spark.functions import skew


def _skewed_frames(spark):
    # 90% of big-side rows share key 0 — the classic hot key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {tuple(r) for r in skew.salted_join(big, small, "k", n_salts=8).collect()}
    assert salted == plain
    assert len(salted) > 0


def test_salt_spreads_hot_key(spark):
    big, _ = _skewed_frames(spark)
    n_salts = 8
    salted = skew.with_salt(big, n_salts=n_salts, salt_on="payload")
    spread = salted.filter(F.col("k") == 0).select(skew.SALT_COL).distinct().count()
    assert spread == n_salts  # hot key's rows hit every salt bucket


def test_left_join_preserves_unmatched(spark):
    big, small = _skewed_frames(spark)
    unmatched_keys = big.filter(F.col("k") >= 1000)
    plain = big.join(small, "k", "left").count()
    salted = skew.salted_join(big, small, "k", n_salts=4, how="left").count()
    assert salted == plain
    assert unmatched_keys.count() > 0  # the case left-join must preserve
