"""Text-analysis operators over the ``documents`` table (SURVEY §2c).

The LLM-pipeline text stage: token counting, quality scoring, language id,
and document fingerprinting. Pure column expressions (codegen'd, partial-
aggregation friendly) — at 100 TB these run as a single scan + projection
with no shuffle at all except where a groupBy is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedb_spark.functions import texttools as tt
from timedb_spark.io.tables import load_table

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.size(tt.ws_tokens(text)).alias("n_tokens_ws"),
        tt.bpe_tokens_count(text).alias("n_tokens_bpe"),
        F.length(text).alias("n_chars_measured"),
    )


TEXT_TOKENS_SQL = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens_ws,
       len(regexp_extract_all(text, '{tt.BPE_TOKEN_PATTERN}')) AS n_tokens_bpe,
       length(text) AS n_chars_measured
FROM documents
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + a composite
    score in [0,1]: long-enough, low-punctuation, some-stopwords documents
    rank high (the classic boilerplate/gibberish filter)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tok = F.size(tt.ws_tokens(text))
    n_punct = tt.punct_count(text)
    n_stop = tt.stopword_count(text, tt.LANG_STOPWORDS["en"])
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)), 6)
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6)
    len_score = F.least(F.length(text).cast("double") / F.lit(200.0), F.lit(1.0))
    score = F.round(0.5 * len_score + 0.25 * (1 - F.least(punct_ratio * 10, F.lit(1.0))) + 0.25 * F.least(stop_ratio * 5, F.lit(1.0)), 6)
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_measured"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


TEXT_QUALITY_SQL = rf"""
WITH base AS (
    SELECT doc_id, text,
           len(string_split_regex(trim(text), '\s+')) AS n_tok,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["en"]}')) AS n_stop
    FROM documents
),
ratios AS (
    SELECT doc_id, text,
           round(CAST(n_punct AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
           round(CAST(n_stop AS DOUBLE) / greatest(n_tok, 1), 6) AS stop_ratio,
           least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS len_score
    FROM base
)
SELECT doc_id,
       length(text) AS n_chars_measured,
       punct_ratio,
       stop_ratio AS stopword_ratio,
       round(0.5*len_score + 0.25*(1 - least(punct_ratio*10, 1.0)) + 0.25*least(stop_ratio*5, 1.0), 6) AS quality_score
FROM ratios
"""


# ---------------------------------------------------------------------------
# language id
# ---------------------------------------------------------------------------


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language id with a CJK character-ratio fast path.
    Deterministic tiebreak: languages checked in fixed order, first max wins."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    counts = {lang: tt.stopword_count(low, pat) for lang, pat in tt.LANG_STOPWORDS.items()}
    cjk = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[一-鿿]"), 0))
    best = F.greatest(*counts.values())
    pred = F.when(cjk * 3 >= F.length(F.col("text")), F.lit("zh"))
    for lang in ("en", "de", "es", "fr"):
        pred = pred.when((counts[lang] == best) & (best > 0), F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    out = [counts[lang].alias(f"hits_{lang}") for lang in ("en", "de", "es", "fr")]
    return docs.select("doc_id", F.col("lang").alias("labeled_lang"), *out, pred.alias("predicted_lang"))


TEXT_LANGID_SQL = rf"""
WITH c AS (
    SELECT doc_id, lang AS labeled_lang, text,
           len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["en"]}')) AS hits_en,
           len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["de"]}')) AS hits_de,
           len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["es"]}')) AS hits_es,
           len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["fr"]}')) AS hits_fr,
           len(regexp_extract_all(text, '[\x{{4e00}}-\x{{9fff}}]')) AS cjk
    FROM documents
)
SELECT doc_id, labeled_lang, hits_en, hits_de, hits_es, hits_fr,
       CASE
           WHEN cjk * 3 >= length(text) THEN 'zh'
           WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) AND greatest(hits_en, hits_de, hits_es, hits_fr) > 0 THEN 'en'
           WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) AND greatest(hits_en, hits_de, hits_es, hits_fr) > 0 THEN 'de'
           WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) AND greatest(hits_en, hits_de, hits_es, hits_fr) > 0 THEN 'es'
           WHEN hits_fr = greatest(hits_en, hits_de, hits_es, hits_fr) AND greatest(hits_en, hits_de, hits_es, hits_fr) > 0 THEN 'fr'
           ELSE 'und'
       END AS predicted_lang
FROM c
"""


# ---------------------------------------------------------------------------
# fingerprint
# ---------------------------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tt.ws_tokens(F.col("text"))
    return docs.select("doc_id", tt.fingerprint(toks).alias("fingerprint"))


TEXT_FINGERPRINT_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           list_transform(string_split_regex(trim(text), '\s+'),
               t -> (strpos('0123456789abcdef', substr(md5(t),1,1))-1) * 1048576
                  + (strpos('0123456789abcdef', substr(md5(t),2,1))-1) * 65536
                  + (strpos('0123456789abcdef', substr(md5(t),3,1))-1) * 4096
                  + (strpos('0123456789abcdef', substr(md5(t),4,1))-1) * 256
                  + (strpos('0123456789abcdef', substr(md5(t),5,1))-1) * 16
                  + (strpos('0123456789abcdef', substr(md5(t),6,1))-1)) AS th
    FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                   (a, b) -> (a * 1000003 + b) % 2147483647) AS fingerprint
FROM tok
"""


# ---------------------------------------------------------------------------
# tf-idf term relevance
# ---------------------------------------------------------------------------


def text_tfidf(spark: SparkSession, sf_dir: str, *, top_n: int = 3) -> DataFrame:
    """Top-N most distinctive terms per document by rarity-weighted term
    frequency — tf × (N/df), the ln-free tf-idf variant (monotone in idf for
    a fixed tf), kept in exact integer arithmetic so the per-document ranking
    is bit-identical across engines (no float-ulp rank flips at the gate).

    Scale shape: explode → (doc, term) partial-agg tf [shuffle 1];
    vocabulary df is a tiny map-side-combined agg [shuffle 2] that comes
    back as a broadcast join; corpus size N rides along as a broadcast
    1-row cross join (never a driver collect); final per-doc ranking
    repartitions by doc_id only [shuffle 3]. No step is quadratic in corpus
    size and the vocab never sits on one node.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .withColumn("score", F.expr("tf * ((1000000 * n_docs) div df)"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


TEXT_TFIDF_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           tf.tf * ((1000000 * n.n_docs) // df.df) AS score
    FROM tf JOIN df USING (term), n
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, score, rank FROM r WHERE rank <= 3
"""
