"""Similarity search over the ``embeddings`` table (SURVEY §2d).

``ann_bruteforce`` — exact top-k cosine neighbours, the correctness
baseline: broadcast the (small) query set against the full vector table,
JVM-side quantized dot products, per-query window top-k.

``ann_lsh`` — the 100 TB scale path: random-hyperplane signatures bucket
the vectors; each query only scores its own bucket. Hyperplane weights are
derived deterministically from md5 nibbles so the index is reproducible
with no RNG state. Recall vs brute force is measured in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.functions import texttools as tt
from timedb_spark.functions import vectors as vx
from timedb_spark.io.tables import load_table

_TOP_K = 5
_N_QUERIES = 10


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", vx.quantize(F.col("embedding")).alias("q"))


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbours for query vectors vec_id < N.

    Plan shape: broadcast hash join (queries are tiny) → one projection of
    quantized dot products → window top-k partitioned by query. No shuffle
    of the big side beyond the window's per-query grouping."""
    vecs = _quantized(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            vx.cosine_q(F.col("qv"), F.col("q")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round(F.col("_cos"), 6).alias("cosine"), "rank")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH vecs AS (
    SELECT vec_id, {vx.QUANTIZE_SQL.format(v='embedding')} AS q FROM embeddings
),
queries AS (SELECT vec_id AS query_id, q AS qv FROM vecs WHERE vec_id < {_N_QUERIES}),
scored AS (
    SELECT query_id, v.vec_id AS neighbor_id,
           {vx.cosine_q_sql('qv', 'v.q')} AS c
    FROM vecs v JOIN queries ON v.vec_id != query_id
),
ranked AS (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; rows-only correctness)
# ---------------------------------------------------------------------------

_LSH_BITS = 8


def _hyperplane(dim: int, j: int):
    """Deterministic pseudo-random hyperplane j: weight i = md5-nibble-derived
    integer in [-8, 7]. No RNG state; identical across runs and engines."""
    return F.array(*[tt.nibble(F.substring(F.md5(F.lit(f"hp:{j}:{i}")), 1, 1)) - 8 for i in range(dim)])


def lsh_signature(vec, dim: int, bits: int = _LSH_BITS):
    sig = F.lit(0)
    for j in range(bits):
        proj = F.aggregate(
            F.zip_with(vec, _hyperplane(dim, j), lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
    return sig


def ann_lsh(spark: SparkSession, sf_dir: str, *, dim: int = 64) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH bucket.

    At 100 TB: signatures are one scan; the bucket join shuffles each vector
    once on an 8-bit key (256 buckets → ~n/256 candidates per query instead
    of n). Multi-probe (flip one bit) would raise recall at 2× candidate
    cost — not needed at test scale."""
    vecs = _quantized(spark, sf_dir).withColumn("sig", lsh_signature(F.col("q"), dim))
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv"), F.col("sig").alias("qsig")
    )
    scored = (
        vecs.join(F.broadcast(queries), (F.col("sig") == F.col("qsig")) & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), vx.cosine_q(F.col("qv"), F.col("q")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round(F.col("_cos"), 6).alias("cosine"), "rank")
    )
