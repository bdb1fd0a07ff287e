"""End-to-end LLM-data curation pipeline (SURVEY §2c flagship composition).

``pipeline_clean`` chains the curation stages a training-data run applies to
a raw document corpus — each stage an operator this repo already ships,
composed as ONE lazy DataFrame plan (Catalyst fuses the projections; the
only shuffle is the exact-dedup groupBy):

  1. exact dedup      — canonical doc (min doc_id) per normalized-text group
  2. quality filter   — composite length/punctuation/stopword score ≥ 0.7
  3. split assignment — leakage-free deterministic train/val/test by
                        content-key hash

Output is row-level (every surviving doc with its score and split) so the
DuckDB oracle hash-checks the full decision, not just counts.

Scale posture: stage 1 is one map-side-combinable groupBy on a 128-bit
text key; stages 2-3 are pure projections riding the same scan — the whole
pipeline is one shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedb_spark.functions import texttools as tt
from timedb_spark.io.tables import load_table

QUALITY_FLOOR = 0.7


def pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")

    # stage 1: exact dedup (keep the min-doc_id member of each text group)
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    keyed = docs.withColumn("text_key", F.md5(norm))
    canonical = keyed.groupBy("text_key").agg(F.min("doc_id").alias("keep_id"))
    kept = keyed.join(canonical, "text_key").filter(F.col("doc_id") == F.col("keep_id"))

    # stage 2: quality floor (same formula as operators.text.text_quality)
    n_tok = F.size(tt.ws_tokens(text))
    punct_ratio = tt.punct_count(text).cast("double") / F.greatest(F.length(text), F.lit(1))
    stop_ratio = tt.stopword_count(text, tt.LANG_STOPWORDS["en"]).cast("double") / F.greatest(n_tok, F.lit(1))
    len_score = F.least(F.length(text).cast("double") / F.lit(200.0), F.lit(1.0))
    score = F.round(
        0.5 * len_score
        + 0.25 * (1 - F.least(F.round(punct_ratio, 6) * 10, F.lit(1.0)))
        + 0.25 * F.least(F.round(stop_ratio, 6) * 5, F.lit(1.0)),
        6,
    )
    scored = kept.withColumn("quality_score", score).filter(F.col("quality_score") >= QUALITY_FLOOR)

    # stage 3: deterministic split by doc_id hash (leakage-free)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(h.isin("c", "d"), "val").when(h.isin("e", "f"), "test").otherwise("train")
    return scored.select("doc_id", "lang", "source", "quality_score", split.alias("split"))


PIPELINE_CLEAN_SQL = rf"""
WITH keyed AS (
    SELECT doc_id, lang, source, text,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS text_key
    FROM documents
),
canonical AS (SELECT text_key, min(doc_id) AS keep_id FROM keyed GROUP BY text_key),
kept AS (
    SELECT k.* FROM keyed k JOIN canonical c ON k.text_key = c.text_key AND k.doc_id = c.keep_id
),
scored AS (
    SELECT doc_id, lang, source,
           round(0.5 * least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               + 0.25 * (1 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                                         / greatest(length(text), 1), 6) * 10, 1.0))
               + 0.25 * least(round(CAST(len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["en"]}')) AS DOUBLE)
                                    / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) * 5, 1.0),
               6) AS quality_score
    FROM kept
)
SELECT doc_id, lang, source, quality_score,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
            ELSE 'train' END AS split
FROM scored
WHERE quality_score >= {QUALITY_FLOOR}
"""
