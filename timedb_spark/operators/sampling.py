"""Deterministic sampling / splitting / sharding / packing for training-data
pipelines (SURVEY §2g).

Everything here is HASH-deterministic, not RNG-based: the keep/assign
decision is a pure function of the row key (md5 hex prefix), so results are
reproducible across runs, engines (the DuckDB oracle computes the same md5),
cluster sizes and partitionings — the property a 100 TB training-data
pipeline actually needs (resumable, auditable, no seed-plumbing).

Scale posture: every op is a narrow map over the scan (hash + compare — no
shuffle at all for sample/split/shard beyond the final summary agg), so
they pipeline into whatever reads follow. Packing shuffles once on the
group key, then packs greedily inside each group via applyInPandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.io.tables import load_table

# md5 of the stringified key: first hex char uniform over 16 buckets.
# String-compare semantics are identical in Spark and DuckDB (lowercase hex).


def _hx(col, n=1):
    return F.substring(F.md5(F.col(col).cast("string")), 1, n)


# ---------------------------------------------------------------------------
# stratified deterministic sample
# ---------------------------------------------------------------------------


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% deterministic sample of documents within every (lang, source)
    stratum: keep rows whose md5(doc_id) starts with 0-3. Pure map — the
    filter rides the scan; no shuffle until the per-stratum summary."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(_hx("doc_id").isin("0", "1", "2", "3"))
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SAMPLE_STRATIFIED_SQL = """
SELECT lang, source,
       count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# train / val / test split
# ---------------------------------------------------------------------------


def train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12/2/2-sixteenths train/val/test assignment per doc.
    Returns every doc with its split — the row-level contract a downstream
    trainer consumes; leakage-free because assignment is content-key-pure."""
    docs = load_table(spark, sf_dir, "documents")
    h = _hx("doc_id")
    split = (
        F.when(h.isin("c", "d"), "val").when(h.isin("e", "f"), "test").otherwise("train")
    )
    return docs.select("doc_id", "lang", "source", split.alias("split"))


TRAIN_SPLIT_SQL = """
SELECT doc_id, lang, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# shard assignment
# ---------------------------------------------------------------------------

N_SHARDS = 8


def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-shard documents into N_SHARDS balanced output shards (the
    write-side layout step before a training job reads them back): shard =
    first-two-hex-chars mod N. Summary per shard proves balance."""
    docs = load_table(spark, sf_dir, "documents")
    shard = F.conv(_hx("doc_id", 2), 16, 10).cast("int") % N_SHARDS
    return (
        docs.select(shard.alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


SHARD_ASSIGN_SQL = f"""
SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER) % {N_SHARDS} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# greedy context-window packing (rows-only: imperative per-group logic)
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 512

#: docs per first-level pack bucket — bounds every pandas group regardless of
#: how skewed the per-source document counts are.
PACK_BUCKET_DOCS = 4096


def pack_documents(
    spark: SparkSession, sf_dir: str, *, budget: int = PACK_BUDGET_TOKENS, bucket_docs: int = PACK_BUCKET_DOCS
) -> DataFrame:
    """Greedy sequence packing: concatenate documents into packs of at most
    ``budget`` whitespace-tokens — the step that turns a deduped corpus into
    fixed-length training sequences.

    Two-level, skew-proof shape (a single dominant source is the NORM in web
    corpora, and a per-source fold would make it one pandas group / one task
    / one OOM at 100 TB):

    1. **Bucket fold** — groups are ``(source, doc_id div bucket_docs)``, so
       every pandas group holds ≤ ``bucket_docs`` rows no matter how big the
       source is; the greedy fold runs in doc_id order inside each bucket.
       Each bucket's trailing partial pack is flagged.
    2. **Tail merge** — per source, ONE row per bucket (the trailing pack)
       flows to a second, tiny ``applyInPandas`` that greedily merges
       consecutive tails in bucket order. Work is O(#buckets), i.e. 4096×
       smaller than the corpus — the sequential step no longer scales with
       source size.

    Deterministic and partitioning-independent: pack ids are derived from
    (bucket, in-bucket index) arithmetic (unique, stable, opaque — NOT
    contiguous), never from task order. An oversized single doc still gets
    its own pack (never split, never dropped). Invariants (conservation,
    budget, determinism, giant-source boundedness) are pinned in
    tests/test_sampling.py.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        (F.col("doc_id") / bucket_docs).cast("long").alias("bucket"),
    )

    def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pid, used = [], 0, 0
        for t in pdf["n_tokens"]:
            if used > 0 and used + t > budget:
                pid, used = pid + 1, 0
            pack_ids.append(pid)
            used += t
        pdf["local_pid"] = pack_ids
        out = pdf.groupby("local_pid").agg(n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum")).reset_index()
        out["source"] = pdf["source"].iloc[0]
        out["bucket"] = pdf["bucket"].iloc[0]
        out["is_tail"] = out["local_pid"] == out["local_pid"].max()
        return out[["source", "bucket", "local_pid", "n_docs", "total_tokens", "is_tail"]]

    bucketed = docs.groupBy("source", "bucket").applyInPandas(
        _pack_bucket, "source string, bucket long, local_pid long, n_docs long, total_tokens long, is_tail boolean"
    )
    # local_pid < bucket_docs (every pack holds ≥ 1 doc) ⇒ this id is unique
    # per source and reproduces the single-fold ordering (bucket-major).
    pid_expr = (F.col("bucket") * bucket_docs + F.col("local_pid")).alias("pack_id")
    complete = bucketed.filter(~F.col("is_tail")).select("source", pid_expr, "n_docs", "total_tokens")

    def _merge_tails(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        rows, cur = [], None
        for r in pdf.itertuples():
            if cur is not None and cur["total_tokens"] + r.total_tokens <= budget:
                cur["n_docs"] += r.n_docs
                cur["total_tokens"] += r.total_tokens
            else:
                if cur is not None:
                    rows.append(cur)
                cur = {
                    "source": r.source,
                    "pack_id": r.bucket * bucket_docs + r.local_pid,
                    "n_docs": r.n_docs,
                    "total_tokens": r.total_tokens,
                }
        if cur is not None:
            rows.append(cur)
        return pd.DataFrame(rows, columns=["source", "pack_id", "n_docs", "total_tokens"])

    merged = (
        bucketed.filter(F.col("is_tail"))
        .groupBy("source")
        .applyInPandas(_merge_tails, "source string, pack_id long, n_docs long, total_tokens long")
    )
    return complete.unionByName(merged)


# ---------------------------------------------------------------------------
# domain-mixture rebalance
# ---------------------------------------------------------------------------

#: per-language keep rate in sixteenths (md5 first-nibble buckets): the
#: over-represented language is thinned toward a balanced mix, the rest kept.
MIX_SIXTEENTHS = {"en": 6, "de": 16, "es": 16, "fr": 16, "zh": 16}


def sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing — the "data mixing" step of corpus
    building: each language stratum keeps a deterministic md5-bucket
    fraction chosen to pull the corpus toward the target mix (here: thin
    the dominant language, keep the rest). Same scale posture as
    sample_stratified: the keep decision is a pure per-row map riding the
    scan; no shuffle at all (row-level output, hash-verified by the gate)."""
    from timedb_spark.functions import texttools as tt

    docs = load_table(spark, sf_dir, "documents")
    nib = tt.nibble(_hx("doc_id"))
    rate = F.lit(16)
    for lang, r in MIX_SIXTEENTHS.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.filter(nib < rate).select("doc_id", "lang", "source", "n_chars")


_MIX_RATE_CASE = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_SIXTEENTHS.items())

SAMPLE_MIX_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
      < (CASE {_MIX_RATE_CASE} ELSE 16 END)
"""


# ---------------------------------------------------------------------------
# full DuckDB oracle for pack_documents (r5 upgrade from rows-only): both
# greedy folds are linear recurrences — running token sum with reset at the
# budget, then the tail merge — which RECURSIVE CTEs step exactly, one row
# per group per iteration (the same technique as the ts_holt_winters /
# ts_lttb oracles). Every output value is an integer, so the hash match is
# exact by construction.
# ---------------------------------------------------------------------------

PACK_DOCUMENTS_SQL = rf"""
WITH RECURSIVE docs AS (
    SELECT source, doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           doc_id // {PACK_BUCKET_DOCS} AS bucket,
           row_number() OVER (PARTITION BY source, doc_id // {PACK_BUCKET_DOCS}
                              ORDER BY doc_id) AS rn
    FROM documents
),
-- fold 1: greedy pack within each (source, bucket), doc_id order
fold AS (
    SELECT source, bucket, rn, CAST(0 AS BIGINT) AS pid, n_tokens AS used, n_tokens
    FROM docs WHERE rn = 1
    UNION ALL
    SELECT d.source, d.bucket, d.rn,
           CASE WHEN f.used > 0 AND f.used + d.n_tokens > {PACK_BUDGET_TOKENS}
                THEN f.pid + 1 ELSE f.pid END,
           CASE WHEN f.used > 0 AND f.used + d.n_tokens > {PACK_BUDGET_TOKENS}
                THEN d.n_tokens ELSE f.used + d.n_tokens END,
           d.n_tokens
    FROM fold f JOIN docs d ON d.source = f.source AND d.bucket = f.bucket AND d.rn = f.rn + 1
),
bucket_packs AS (
    SELECT source, bucket, pid AS local_pid,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           pid = max(pid) OVER (PARTITION BY source, bucket) AS is_tail
    FROM fold GROUP BY source, bucket, pid
),
complete AS (
    SELECT source, bucket * {PACK_BUCKET_DOCS} + local_pid AS pack_id, n_docs, total_tokens
    FROM bucket_packs WHERE NOT is_tail
),
tails AS (
    SELECT source, bucket, local_pid, n_docs, total_tokens,
           row_number() OVER (PARTITION BY source ORDER BY bucket) AS rn
    FROM bucket_packs WHERE is_tail
),
-- fold 2: greedy merge of consecutive tails per source (bucket order)
mfold AS (
    SELECT source, rn, bucket * {PACK_BUCKET_DOCS} + local_pid AS grp_pack_id,
           n_docs AS acc_docs, total_tokens AS acc_tokens
    FROM tails WHERE rn = 1
    UNION ALL
    SELECT t.source, t.rn,
           CASE WHEN m.acc_tokens + t.total_tokens <= {PACK_BUDGET_TOKENS}
                THEN m.grp_pack_id ELSE t.bucket * {PACK_BUCKET_DOCS} + t.local_pid END,
           CASE WHEN m.acc_tokens + t.total_tokens <= {PACK_BUDGET_TOKENS}
                THEN m.acc_docs + t.n_docs ELSE t.n_docs END,
           CASE WHEN m.acc_tokens + t.total_tokens <= {PACK_BUDGET_TOKENS}
                THEN m.acc_tokens + t.total_tokens ELSE t.total_tokens END
    FROM mfold m JOIN tails t ON t.source = m.source AND t.rn = m.rn + 1
),
-- the LAST accumulator row per merge group is that merged pack's final state
merged AS (
    SELECT source, grp_pack_id AS pack_id,
           max_by(acc_docs, rn) AS n_docs, max_by(acc_tokens, rn) AS total_tokens
    FROM mfold GROUP BY source, grp_pack_id
)
SELECT source, pack_id, n_docs, total_tokens FROM complete
UNION ALL
SELECT source, pack_id, n_docs, total_tokens FROM merged
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement — Efraimidis–Spirakis A-ES
# ---------------------------------------------------------------------------

SAMPLE_WEIGHTED_K = 100

#: 48-bit uniform from the md5 of a salted key: largest integer width whose
#: values are all exactly representable as doubles (2^48 < 2^53), so the
#: (h+1)/(2^48+1) division is the same IEEE double in both engines.
_WS_SALT = "wsample-1"
_WS_BITS = 12  # hex nibbles


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``SAMPLE_WEIGHTED_K`` weighted sample of documents without
    replacement, weight = n_chars — the Efraimidis–Spirakis (2006) A-ES
    scheme: each row draws u ~ U(0,1) from a deterministic salted hash and
    ranks by key = ln(u)/w (equivalently u^(1/w)); the global top-k by key
    IS an exact weighted sample without replacement. This is THE
    distributed weighted sampler: one scan, per-row arithmetic, and a
    single top-k (TakeOrdered — partial per-partition heaps, never a full
    sort) — no state, no rejection loop, no second pass, reproducible
    across runs and engines.

    Determinism: u = (h+1)/(2^48+1) from the first 12 md5 nibbles — exact
    integers into one IEEE division; ln(u)/w diverges between engines only
    below ulp, far under the gap between adjacent order keys. Output keys
    floor-scaled to 9 dp.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(_WS_SALT), F.col("doc_id").cast("string")))
    hv = F.lit(0).cast("long")
    for j in range(1, _WS_BITS + 1):
        hv = hv * 16 + (F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1).cast("long")
    u = (hv + 1).cast("double") / F.lit(float(2**48 + 1))
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            (F.floor(key * 1e9) / 1e9).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(SAMPLE_WEIGHTED_K)
    )


def _ws_hash_sql() -> str:
    expr = "CAST(0 AS BIGINT)"
    for j in range(1, _WS_BITS + 1):
        nib = f"(strpos('0123456789abcdef', substr(md5('{_WS_SALT}' || CAST(doc_id AS VARCHAR)), {j}, 1)) - 1)"
        expr = f"(({expr}) * 16 + CAST({nib} AS BIGINT))"
    return expr


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, source, n_chars,
       floor(ln(CAST(({_ws_hash_sql()}) + 1 AS DOUBLE) / {float(2**48 + 1)!r})
             / CAST(n_chars AS DOUBLE) * 1e9) / 1e9 AS es_key
FROM documents
ORDER BY es_key DESC, doc_id
LIMIT {SAMPLE_WEIGHTED_K}
"""


# ---------------------------------------------------------------------------
# Temperature sampling — α-rebalanced language/domain mixture
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3  # the multilingual-pretraining standard (XLM-R / mT5)


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-temperature mixture rebalancing (Conneau et al. 2020, XLM-R §3.1;
    Xue et al. 2021, mT5): per language, the sampling distribution is
    q_l ∝ p_l^α with α = 0.3 — upweighting tail languages without
    flattening the mix entirely. Emits per-language corpus share p,
    rebalanced share q, the per-DOCUMENT sampling weight q/p (the number
    a weighted sampler or loss-scaler consumes), and the expected docs
    drawn per epoch at the corpus size — the planning readout run BEFORE
    committing a multilingual sampling schedule.

    One scan + one tiny groupBy(lang); p^α computed as exp(α·ln p)
    EXPLICITLY on both engines (one ln + one exp per language on
    identical doubles, the events_entropy libm convention — pow() is
    deliberately avoided, its rounding is less uniform across libms);
    the normalizer Z = Σ p^α folds in PINNED lang order (a plain sum()
    of doubles is partial-agg-order-sensitive and would drift between
    engines); floor-6 outputs.
    """
    docs = load_table(spark, sf_dir, "documents")
    n1 = docs.agg(F.count(F.lit(1)).alias("n_total"))
    per = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    g = per.join(F.broadcast(n1))
    p = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    g = g.withColumn("p", p).withColumn(
        "pa", F.exp(F.lit(_TEMP_ALPHA) * F.log(F.col("p")))
    )
    z = g.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("lang"), F.col("pa")))),
            F.lit(0.0),
            lambda acc, s: acc + s.pa,
        ).alias("z")
    )
    g = g.join(F.broadcast(z))
    q = F.col("pa") / F.col("z")
    return g.select(
        "lang",
        "n_docs",
        (F.floor(F.col("p") * 1e6) / 1e6).alias("p_share"),
        (F.floor(q * 1e6) / 1e6).alias("q_share"),
        (F.floor(q / F.col("p") * 1e6) / 1e6).alias("doc_weight"),
        (F.floor(q * F.col("n_total").cast("double") * 1e6) / 1e6).alias("expected_docs"),
    )


SAMPLE_TEMPERATURE_SQL = f"""
WITH per AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
n1 AS (SELECT count(*) AS n_total FROM documents),
g AS (
    SELECT lang, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p,
           exp({_TEMP_ALPHA} * ln(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE))) AS pa,
           n_total
    FROM per CROSS JOIN n1
),
z AS (
    SELECT list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_sort(list(struct_pack(lang := lang, pa := pa))), s -> s.pa)),
        (a, b) -> a + b) AS z
    FROM g
)
SELECT lang, n_docs,
       floor(p * 1e6) / 1e6 AS p_share,
       floor(pa / z.z * 1e6) / 1e6 AS q_share,
       floor(pa / z.z / p * 1e6) / 1e6 AS doc_weight,
       floor(pa / z.z * CAST(n_total AS DOUBLE) * 1e6) / 1e6 AS expected_docs
FROM g CROSS JOIN z
"""


# ---------------------------------------------------------------------------
# Dedup-aware weighted sampling — cluster-debiased A-ES
# ---------------------------------------------------------------------------

_DA_SALT = "dasample-1"


def sample_dedup_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample that DEBIASES near-duplicate clusters: each doc's
    A-ES weight is n_chars / cluster_size, where cluster_size comes from
    the minhash connected components (dedup_clusters) and singletons count
    1 — so a 10-way duplicated page gets one page's worth of total
    sampling mass, not ten (the standard correction when training-data
    sampling runs BEFORE physical dedup, e.g. when near-dups must survive
    for attribution but not be over-trained on). Same Efraimidis–Spirakis
    key and determinism discipline as sample_weighted, different salt.

    Shape: dedup_clusters' label table → one tiny groupBy(cluster_id) →
    broadcast-join of sizes back onto the scan → per-row key → ONE top-k
    (TakeOrdered partial heaps, no global sort). At 100 TB the cluster-size
    table is #dup-docs rows — orders of magnitude under the corpus."""
    from timedb_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    labels = dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    doc_size = labels.join(sizes, "cluster_id").select("doc_id", "csize")
    d = docs.join(F.broadcast(doc_size), "doc_id", "left").withColumn(
        "cluster_size", F.coalesce("csize", F.lit(1).cast("long"))
    )
    h = F.md5(F.concat(F.lit(_DA_SALT), F.col("doc_id").cast("string")))
    hv = F.lit(0).cast("long")
    for j in range(1, _WS_BITS + 1):
        hv = hv * 16 + (F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1).cast("long")
    u = (hv + 1).cast("double") / F.lit(float(2**48 + 1))
    w = F.col("n_chars").cast("double") / F.col("cluster_size").cast("double")
    key = F.log(u) / w
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "cluster_size",
            (F.floor(key * 1e9) / 1e9).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(SAMPLE_WEIGHTED_K)
    )


def _da_hash_sql() -> str:
    expr = "CAST(0 AS BIGINT)"
    for j in range(1, _WS_BITS + 1):
        nib = f"(strpos('0123456789abcdef', substr(md5('{_DA_SALT}' || CAST(doc_id AS VARCHAR)), {j}, 1)) - 1)"
        expr = f"(({expr}) * 16 + CAST({nib} AS BIGINT))"
    return expr


def sample_dedup_aware_sql(dedup_clusters_sql: str) -> str:
    # the clusters oracle carries its own nested WITH RECURSIVE — legal as
    # a CTE body (any SELECT statement), and the recursion must survive.
    return f"""
WITH labels AS ({dedup_clusters_sql}),
sizes AS (
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize FROM labels GROUP BY cluster_id
),
ds AS (
    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           coalesce(s.csize, CAST(1 AS BIGINT)) AS cluster_size
    FROM documents d
    LEFT JOIN (SELECT l.doc_id, z.csize FROM labels l JOIN sizes z ON z.cluster_id = l.cluster_id) s
      ON s.doc_id = d.doc_id
)
SELECT doc_id, lang, source, n_chars, cluster_size,
       floor(ln(CAST(({_da_hash_sql()}) + 1 AS DOUBLE) / {float(2**48 + 1)!r})
             / (CAST(n_chars AS DOUBLE) / CAST(cluster_size AS DOUBLE)) * 1e9) / 1e9 AS es_key
FROM ds
ORDER BY es_key DESC, doc_id
LIMIT {SAMPLE_WEIGHTED_K}
"""


# ---------------------------------------------------------------------------
# greedy k-center coreset — diversity-maximizing sample
# ---------------------------------------------------------------------------

_KCENTER_K = 8


def sample_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus (Gonzalez 1985 /
    'farthest-point' selection): start from the minimum vec_id, repeatedly
    add the vector FARTHEST (max min-cosine-distance) from everything
    chosen so far — the 2-approximation diversity sample that seeds
    balanced eval sets, prompts-for-labeling, and kmeans++-style inits
    (where sample_stratified balances by a LABEL, this balances by
    GEOMETRY and needs no labels).

    Scale shape: k−1 rounds, each ONE scan with the ≤k chosen vectors as a
    broadcast (no pairwise n² join ever); the argmax is a global
    TakeOrdered (top-1) per round — deterministic via the (distance desc,
    vec_id) tiebreak, identical in the oracle's k−1 unrolled CTEs. Chosen
    rows localCheckpoint per round so round r doesn't replay rounds
    1..r−1. Distances = 1 − exact-quantized-integer cosine; comparisons on
    bit-identical doubles both engines."""
    from timedb_spark.functions import vectors as vx

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", vx.quantize(F.col("embedding")).alias("q")
    ).localCheckpoint(eager=False)
    first = (
        vecs.orderBy("vec_id").limit(1)
        .select("vec_id", "q", F.lit(1).cast("int").alias("pick_rank"),
                F.lit(None).cast("double").alias("min_dist"))
    )
    chosen = first.localCheckpoint(eager=False)
    for r in range(2, _KCENTER_K + 1):
        c = chosen.select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        cand = (
            vecs.join(F.broadcast(c), F.col("vec_id") != F.col("cid"))
            .groupBy("vec_id")
            .agg(
                F.min(1.0 - vx.cosine_q(F.col("q"), F.col("cq"))).alias("d"),
                F.count(F.lit(1)).alias("nc"),
            )
            # vectors already chosen match only k-1 of the k chosen rows —
            # exclude them by the join-arity count, not a second join
            .filter(F.col("nc") == (r - 1))
        )
        best = (
            cand.orderBy(F.col("d").desc(), F.col("vec_id")).limit(1)
            .join(vecs, "vec_id")
            .select("vec_id", "q", F.lit(r).cast("int").alias("pick_rank"),
                    F.col("d").alias("min_dist"))
        )
        chosen = chosen.unionByName(best).localCheckpoint(eager=False)
    return chosen.select(
        "pick_rank", "vec_id",
        F.when(F.col("min_dist").isNotNull(), F.floor(F.col("min_dist") * 1e6) / 1e6).alias("min_dist"),
    ).orderBy("pick_rank")


def _kcenter_iter_sql(prev: str, out: str, r: int, cosine_sql) -> str:
    return f"""
{out} AS (
    SELECT * FROM {prev}
    UNION ALL
    SELECT vec_id, q, {r} AS pick_rank, d AS min_dist FROM (
        -- subquery so ORDER/LIMIT bind to the argmax arm, not the union
        SELECT * FROM (
            SELECT v.vec_id, v.q, min(1.0 - {cosine_sql}) AS d, count(*) AS nc
            FROM vecs v JOIN {prev} c ON v.vec_id != c.vec_id
            GROUP BY v.vec_id, v.q
        ) WHERE nc = {r - 1}
        ORDER BY d DESC, vec_id LIMIT 1
    )
)"""


def _kcenter_sql() -> str:
    from timedb_spark.functions import vectors as vx

    cos = vx.cosine_q_sql("v.q", "c.q")
    iters = ",".join(
        _kcenter_iter_sql(f"s{r - 1}", f"s{r}", r, cos) for r in range(2, _KCENTER_K + 1)
    )
    return f"""
WITH vecs AS (
    SELECT vec_id, {vx.QUANTIZE_SQL.format(v='embedding')} AS q FROM embeddings
),
s1 AS (
    SELECT vec_id, q, 1 AS pick_rank, CAST(NULL AS DOUBLE) AS min_dist
    FROM vecs ORDER BY vec_id LIMIT 1
),
{iters}
SELECT CAST(pick_rank AS INT) AS pick_rank, vec_id,
       CASE WHEN min_dist IS NOT NULL THEN floor(min_dist * 1e6) / 1e6 END AS min_dist
FROM s{_KCENTER_K}
ORDER BY pick_rank
"""


SAMPLE_KCENTER_SQL = _kcenter_sql()


# ---------------------------------------------------------------------------
# temporal split — leakage-free forecasting train/test boundaries
# ---------------------------------------------------------------------------

_TSPLIT_TEST_PCT_NUM = 1
_TSPLIT_TEST_PCT_DEN = 5  # last 20% of each series is the test window
_TSPLIT_MIN_OBS = 10


def train_split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split per series: the LAST 20% of each series'
    observations (by event time) become the test window — the only
    leakage-free split for forecasting models (train_split's hash split is
    right for exchangeable documents and WRONG for time series: a random
    split trains on the future). Emits per-series boundary facts a trainer
    consumes: counts per side and the exact boundary timestamp (first test
    observation).

    One per-series ROW_NUMBER window (no arrays); the test size is the
    exact integer ⌈n/5⌉ so both engines cut at the identical row; boundary
    timestamps ride max/min aggregates. The output is per-series (one row)
    — the event-level assignment is the same window expression inlined in
    a trainer's own scan, documented here as the contract."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("user_id", "ts", F.row_number().over(w).alias("rn"))
    g = d.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_obs"), F.max("ts").alias("last_ts"))
    g = g.filter(F.col("n_obs") >= _TSPLIT_MIN_OBS)
    n_test = F.ceil(
        F.col("n_obs") * _TSPLIT_TEST_PCT_NUM / _TSPLIT_TEST_PCT_DEN
    ).cast("long")
    g = g.withColumn("n_test", n_test).withColumn(
        "n_train", (F.col("n_obs") - F.col("n_test")).cast("long")
    )
    first_test = (
        d.join(g.select("user_id", "n_train"), "user_id")
        .filter(F.col("rn") == F.col("n_train") + 1)
        .select("user_id", F.col("ts").alias("test_start_ts"))
    )
    return g.join(first_test, "user_id").select(
        "user_id",
        F.col("n_obs").cast("long").alias("n_obs"),
        "n_train",
        "n_test",
        "test_start_ts",
        "last_ts",
    )


TRAIN_SPLIT_TEMPORAL_SQL = f"""
WITH d AS (
    SELECT user_id, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
g AS (
    SELECT user_id, count(*) AS n_obs, max(ts) AS last_ts
    FROM d GROUP BY user_id HAVING count(*) >= {_TSPLIT_MIN_OBS}
),
sizes AS (
    SELECT user_id, n_obs, last_ts,
           CAST(ceil(CAST(n_obs AS DOUBLE) * {_TSPLIT_TEST_PCT_NUM} / {_TSPLIT_TEST_PCT_DEN}) AS BIGINT) AS n_test
    FROM g
),
firsts AS (
    SELECT d.user_id, d.ts AS test_start_ts
    FROM d JOIN sizes s ON s.user_id = d.user_id AND d.rn = s.n_obs - s.n_test + 1
)
SELECT s.user_id,
       CAST(s.n_obs AS BIGINT) AS n_obs,
       CAST(s.n_obs - s.n_test AS BIGINT) AS n_train,
       s.n_test,
       f.test_start_ts,
       s.last_ts
FROM sizes s JOIN firsts f ON f.user_id = s.user_id
"""
