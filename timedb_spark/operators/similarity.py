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
    """Approximate top-k: score only vectors in the query's LSH bucket or a
    ≤2-bit-flip neighbour bucket (multi-probe, 37 probes over 256 buckets).

    At 100 TB: signatures are one scan; the bucket join shuffles each vector
    once on an 8-bit key (256 buckets → ~n/256 candidates per bucket).
    Multi-probe makes recall robust to points near a hyperplane boundary
    (the common LSH failure) for (bits+1)× candidate cost — still ≪ n. The
    probe expansion happens on the tiny broadcast query side only."""
    vecs = _quantized(spark, sf_dir).withColumn("sig", lsh_signature(F.col("q"), dim))
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv"), F.col("sig").alias("qsig")
    )
    flips = [0] + [1 << j for j in range(_LSH_BITS)] + [
        (1 << i) | (1 << j) for i in range(_LSH_BITS) for j in range(i + 1, _LSH_BITS)
    ]
    probes = queries.select(
        "query_id",
        "qv",
        F.explode(F.array(*[F.col("qsig").bitwiseXOR(F.lit(m)) for m in flips])).alias("psig"),
    )
    scored = (
        vecs.join(F.broadcast(probes), (F.col("sig") == F.col("psig")) & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), vx.cosine_q(F.col("qv"), F.col("q")).alias("_cos"))
        # no dedup needed: a vector's one signature matches at most one of a
        # query's (all-distinct) probe signatures
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round(F.col("_cos"), 6).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF-flat ANN (coarse quantizer + probed-cell search)
# ---------------------------------------------------------------------------

_IVF_CELLS = 16
_IVF_NPROBE = 2


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer (one deterministic
    averaging step over ``vec_id % C`` seed cells) partitions the vectors
    into C inverted lists; each query scores only its ``nprobe`` nearest
    cells' lists.

    All arithmetic is exact-integer (quantized components, integer-average
    centroids via ``floor(sum/count + 0.5)``) so the DuckDB oracle is
    bit-identical. At 100 TB: centroids are a broadcast table (C ≪ n), the
    inverted lists are a plain ``cell`` column — candidate generation is an
    equi-join on it (shuffle-hash at scale), candidates per query ≈
    nprobe·n/C instead of n. Recall vs brute force is measured in tests.
    """
    vecs = _quantized(spark, sf_dir).withColumn("scell", F.col("vec_id") % _IVF_CELLS)

    # coarse centroids: elementwise integer mean per seed cell
    comp = vecs.select("scell", F.posexplode("q").alias("pos", "x"))
    centroid = comp.groupBy("scell", "pos").agg(
        F.floor(F.sum("x").cast("double") / F.count(F.lit(1)) + F.lit(0.5)).cast("long").alias("c")
    )
    cent = centroid.groupBy("scell").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s.c).alias("cq")
    ).select(F.col("scell").alias("cell"), "cq")

    # assign every vector to its max-cosine centroid (deterministic tiebreak)
    scored_c = vecs.join(F.broadcast(cent)).select(
        "vec_id", "q", "cell", vx.cosine_q(F.col("q"), F.col("cq")).alias("cs")
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cell"))
    assign = scored_c.withColumn("rn", F.row_number().over(wa)).filter(F.col("rn") == 1).select("vec_id", "q", "cell")

    # queries probe their nprobe nearest cells
    probes = (
        scored_c.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qv"), "cell")
    )

    cand = assign.join(F.broadcast(probes), on="cell").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), vx.cosine_q(F.col("qv"), F.col("q")).alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round(F.col("_cos"), 6).alias("cosine"), "rank")
    )


_IVF_DIM = 64

ANN_IVF_SQL = f"""
WITH vecs AS (
    SELECT vec_id, {vx.QUANTIZE_SQL.format(v='embedding')} AS q, vec_id % {_IVF_CELLS} AS scell
    FROM embeddings
),
comp AS (
    SELECT scell, i, q[i] AS x
    FROM vecs CROSS JOIN (SELECT unnest(range(1, {_IVF_DIM} + 1)) AS i) idx
),
centroid AS (
    SELECT scell, i, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c
    FROM comp GROUP BY scell, i
),
cent AS (SELECT scell AS cell, list(c ORDER BY i) AS cq FROM centroid GROUP BY scell),
scored_c AS (
    SELECT v.vec_id, v.q, c.cell, {vx.cosine_q_sql('v.q', 'c.cq')} AS cs
    FROM vecs v CROSS JOIN cent c
),
assign AS (
    SELECT vec_id, q, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn FROM scored_c
    ) t WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, q AS qv, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
        FROM scored_c WHERE vec_id < {_N_QUERIES}
    ) t WHERE rn <= {_IVF_NPROBE}
),
cand AS (
    SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, a.q
    FROM assign a JOIN probes p ON a.cell = p.cell AND a.vec_id != p.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, {vx.cosine_q_sql('qv', 'q')} AS c,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {vx.cosine_q_sql('qv', 'q')} DESC, neighbor_id) AS rank
    FROM cand
)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {_TOP_K}
"""
