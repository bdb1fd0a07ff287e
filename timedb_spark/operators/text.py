"""Text-analysis operators over the ``documents`` table (SURVEY §2c).

The LLM-pipeline text stage: token counting, quality scoring, language id,
and document fingerprinting. Pure column expressions (codegen'd, partial-
aggregation friendly) — at 100 TB these run as a single scan + projection
with no shuffle at all except where a groupBy is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timedb_spark.functions import texttools as tt
from timedb_spark.functions.rounding import floor6, floor6_sql
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
    rank high (the classic boilerplate/gibberish filter).

    Rounding is floor(x*1e6+0.5)/1e6 on BOTH engines, not round(x,6):
    Spark's HALF_UP on the exact decimal expansion and DuckDB's round
    disagree by 1e-6 when a score lands on the half boundary — observed at
    sf0.1 (docs 1210/2760/3851), the same class that cost r3/r5 red rows.
    floor+0.5 on bit-identical doubles is bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    n_tok = F.size(tt.ws_tokens(text))
    n_punct = tt.punct_count(text)
    n_stop = tt.stopword_count(text, tt.LANG_STOPWORDS["en"])
    punct_ratio = r6(n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)))
    stop_ratio = r6(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)))
    len_score = F.least(F.length(text).cast("double") / F.lit(200.0), F.lit(1.0))
    score = r6(0.5 * len_score + 0.25 * (1 - F.least(punct_ratio * 10, F.lit(1.0))) + 0.25 * F.least(stop_ratio * 5, F.lit(1.0)))
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
    -- floor(x*1e6+0.5)/1e6, not round(x,6): identical halfway mode as the
    -- Spark side (see text_quality docstring)
    SELECT doc_id, text,
           floor(CAST(n_punct AS DOUBLE) / greatest(length(text), 1) * 1e6 + 0.5) / 1e6 AS punct_ratio,
           floor(CAST(n_stop AS DOUBLE) / greatest(n_tok, 1) * 1e6 + 0.5) / 1e6 AS stop_ratio,
           least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS len_score
    FROM base
)
SELECT doc_id,
       length(text) AS n_chars_measured,
       punct_ratio,
       stop_ratio AS stopword_ratio,
       floor((0.5*len_score + 0.25*(1 - least(punct_ratio*10, 1.0)) + 0.25*least(stop_ratio*5, 1.0)) * 1e6 + 0.5) / 1e6 AS quality_score
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


def text_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class / script profile per document — the charset signal a
    corpus pipeline uses to route documents to per-script cleaning (CCNet
    keeps a per-language/script pipeline) and to drop mojibake: exact counts
    of latin letters, digits, whitespace and non-ASCII bytes-as-chars, plus
    the latin fraction.

    Pure projection (regexp_replace length-deltas, Java∩RE2-safe classes) —
    rides the scan, zero shuffles, same posture as text_quality."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n = F.length(t)
    n_latin = n - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    n_digit = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    n_space = n - F.length(F.regexp_replace(t, r"\s", ""))
    n_nonascii = n - F.length(F.regexp_replace(t, "[^\x00-\x7F]", ""))
    frac = F.floor(n_latin.cast("double") / F.nullif(n, F.lit(0)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        n_latin.alias("n_latin"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        n_nonascii.alias("n_nonascii"),
        frac.alias("latin_frac"),
    )


TEXT_SCRIPT_SQL = r"""
SELECT doc_id,
       length(text) AS n_chars,
       length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
       length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_space,
       length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS n_nonascii,
       floor(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
             / nullif(length(text), 0) * 1e6 + 0.5) / 1e6 AS latin_frac
FROM documents
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


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: word bigram/trigram
    totals, the top n-gram's share, and the duplicate-n-gram fraction —
    the "most common 2-gram fraction" / "duplicate n-gram fraction" filters
    from the Gopher data-quality rules (Rae et al. 2021, table A1).

    Shape: ONE explode over both gram lengths tagged by ``n`` → fine-keyed
    (doc, n, gram) count with map-side combine → ONE per-doc conditional
    pivot. Shuffle volume is O(total grams), never quadratic; the gram
    arrays are built with the shared sequence-index shingle helper (no
    per-gram regex work)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tt.ws_tokens(F.col("text")).alias("w"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("n"), tt.shingles(F.col("w"), 2).alias("g")),
                F.struct(F.lit(3).alias("n"), tt.shingles(F.col("w"), 3).alias("g")),
            )
        ).alias("ng"),
    ).select("doc_id", F.col("ng.n").alias("n"), F.explode("ng.g").alias("g"))
    counts = grams.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("c"))

    def _n(col_n: int, expr):
        return F.when(F.col("n") == col_n, expr)

    per_doc = counts.groupBy("doc_id").agg(
        F.sum(_n(2, F.col("c"))).alias("n_bigrams"),
        F.max(_n(2, F.col("c"))).alias("top_bigram_n"),
        F.sum(_n(2, F.lit(1))).alias("_d2"),
        F.sum(_n(3, F.col("c"))).alias("n_trigrams"),
        F.sum(_n(3, F.lit(1))).alias("_d3"),
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        r6(F.col("top_bigram_n").cast("double") / F.col("n_bigrams")).alias("top_bigram_frac"),
        r6(1 - F.col("_d2").cast("double") / F.col("n_bigrams")).alias("dup_bigram_frac"),
        "n_trigrams",
        r6(1 - F.col("_d3").cast("double") / F.col("n_trigrams")).alias("dup_trigram_frac"),
    )


TEXT_REPETITION_SQL = r"""
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
grams AS (
    SELECT doc_id, 2 AS n,
           unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                                 i -> array_to_string(w[i:i+1], ' '))) AS g
    FROM tok
    UNION ALL
    SELECT doc_id, 3 AS n,
           unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS g
    FROM tok
),
counts AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
per_doc AS (
    -- CAST: integer sum() widens to HUGEINT in DuckDB; the gate hash is
    -- type-sensitive, Spark emits bigint.
    SELECT doc_id,
           CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_bigrams,
           max(CASE WHEN n = 2 THEN c END) AS top_bigram_n,
           CAST(sum(CASE WHEN n = 2 THEN 1 END) AS BIGINT) AS d2,
           CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN n = 3 THEN 1 END) AS BIGINT) AS d3
    FROM counts GROUP BY doc_id
)
SELECT doc_id, n_bigrams, top_bigram_n,
       floor(CAST(top_bigram_n AS DOUBLE) / n_bigrams * 1e6 + 0.5) / 1e6 AS top_bigram_frac,
       floor((1 - CAST(d2 AS DOUBLE) / n_bigrams) * 1e6 + 0.5) / 1e6 AS dup_bigram_frac,
       n_trigrams,
       floor((1 - CAST(d3 AS DOUBLE) / n_trigrams) * 1e6 + 0.5) / 1e6 AS dup_trigram_frac
FROM per_doc
"""


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency fluency score per document — the exact-arithmetic
    stand-in for n-gram language-model scoring (KenLM-style filtering):
    how "typical" a document's word bigrams are of the corpus. Documents
    whose bigrams are mostly singletons read as novel/garbled; high mean
    corpus frequency reads as fluent/boilerplate. Emits the mean corpus
    frequency of the doc's bigrams plus its singleton (corpus-unique)
    fraction.

    Scale shape: ONE bigram explode feeds both sides — the global frequency
    table is a map-side-combined count on the SAME (g) key the join uses,
    so the exploded frame shuffles once for the count and once for the
    enrich join (AQE reuses the partitioning), then a per-doc agg. Exact
    integer sums → bit-identical oracle; mean/frac via the
    floor(x·1e6+0.5)/1e6 rounding used across the text ops."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tt.ws_tokens(F.col("text")).alias("w"))
    grams = toks.select("doc_id", F.explode(tt.shingles(F.col("w"), 2)).alias("g"))
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("f"))
    joined = grams.join(freq, "g")
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("f").alias("_fsum"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("_n_singleton"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        r6(F.col("_fsum").cast("double") / F.col("n_bigrams")).alias("mean_bigram_freq"),
        r6(F.col("_n_singleton").cast("double") / F.col("n_bigrams")).alias("singleton_frac"),
    )


TEXT_LM_SCORE_SQL = r"""
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                                 i -> array_to_string(w[i:i+1], ' '))) AS g
    FROM tok
),
freq AS (SELECT g, count(*) AS f FROM grams GROUP BY g),
per_doc AS (
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(f) AS BIGINT) AS fsum,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton
    FROM grams JOIN freq USING (g)
    GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       floor(CAST(fsum AS DOUBLE) / n_bigrams * 1e6 + 0.5) / 1e6 AS mean_bigram_freq,
       floor(CAST(n_singleton AS DOUBLE) / n_bigrams * 1e6 + 0.5) / 1e6 AS singleton_frac
FROM per_doc
"""


# ---------------------------------------------------------------------------
# PII scan + scrub
# ---------------------------------------------------------------------------

#: PII patterns — constructs restricted to the Java-regex ∩ RE2 common
#: subset (no backrefs/lookaround) so Spark and the DuckDB oracle agree.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}

#: Scrub order matters (an SSN also looks phone-ish): most-specific first.
PII_SCRUB_ORDER = ("email", "ssn", "ipv4", "phone")


def pii_scrub(text: Column) -> Column:
    """Redact every PII match with ``<KIND>`` tokens, most-specific first."""
    out = text
    for kind in PII_SCRUB_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + scrub per document: match counts per kind plus the md5 of
    the redacted text (the synthetic corpus is PII-free, so this doubles as
    a cross-engine no-op-scrub proof; the positive path — crafted emails /
    SSNs / IPs / phones detected and redacted — is pinned by unit tests
    against a DuckDB mini-oracle). Pure projection: rides the scan, no
    shuffle, trivially parallel at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    counts = {k: F.size(F.regexp_extract_all(text, F.lit(p), 0)) for k, p in PII_PATTERNS.items()}
    total = sum(list(counts.values())[1:], start=list(counts.values())[0])
    return docs.select(
        "doc_id",
        *[counts[k].alias(f"n_{k}") for k in PII_SCRUB_ORDER],
        total.alias("pii_total"),
        F.md5(pii_scrub(text)).alias("clean_hash"),
    )


def _pii_scrub_sql(col: str) -> str:
    out = col
    for kind in PII_SCRUB_ORDER:
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '<{kind.upper()}>', 'g')"
    return out


TEXT_PII_SQL = rf"""
SELECT doc_id,
       {", ".join(f"len(regexp_extract_all(text, '{PII_PATTERNS[k]}')) AS n_{k}" for k in PII_SCRUB_ORDER)},
       {" + ".join(f"len(regexp_extract_all(text, '{PII_PATTERNS[k]}'))" for k in PII_SCRUB_ORDER)} AS pii_total,
       md5({_pii_scrub_sql("text")}) AS clean_hash
FROM documents
"""




# ---------------------------------------------------------------------------
# boilerplate detection (corpus-frequency shingles)
# ---------------------------------------------------------------------------

_BOILER_N = 3
_BOILER_MIN_DOCS = 5


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's distinct
    word 3-gram shingles that occur in >= ``_BOILER_MIN_DOCS`` distinct
    documents corpus-wide (the C4/RefinedWeb-style boilerplate signal —
    navigation chrome, license banners and template text repeat across
    pages; unique prose does not).

    Plan shape: explode distinct shingles once, then ONE window count over
    the shingle key gives each row its corpus document-frequency — no second
    scan and no join back (the naive formulation aggregates the exploded
    frame twice and joins, shuffling it on the same key anyway). The only
    shuffles are (shingle) then (doc_id), both on the exploded frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tt.shingles(tt.ws_tokens(F.col("text")), _BOILER_N))).alias("s"),
    )
    # distinct-per-doc shingles => count over the shingle partition IS the
    # corpus document-frequency of that shingle.
    df_w = Window.partitionBy("s")
    marked = sh.withColumn("df", F.count(F.lit(1)).over(df_w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("df") >= _BOILER_MIN_DOCS, 1)).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            floor6(F.col("n_boiler") / F.col("n_shingles")).alias("boiler_ratio"),
        )
    )


TEXT_BOILERPLATE_SQL = rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(t, i, i + {_BOILER_N - 1}), ' ') AS s
    FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - {_BOILER_N - 1}, 1) + 1)) AS i
    )
),
marked AS (
    SELECT doc_id, count(*) OVER (PARTITION BY s) AS df FROM sh
)
SELECT doc_id,
       count(*) AS n_shingles,
       count(*) FILTER (df >= {_BOILER_MIN_DOCS}) AS n_boiler,
       {floor6_sql(f'count(*) FILTER (df >= {_BOILER_MIN_DOCS}) / count(*)')} AS boiler_ratio
FROM marked
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus vocabulary (tokenizer-training precursor)
# ---------------------------------------------------------------------------


def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token vocabulary: per-token count, frequency rank, and the
    cumulative share of the corpus covered by tokens up to that rank — the
    curve a tokenizer-training / vocab-sizing pass reads off first.

    The global window runs over the AGGREGATED vocabulary (|vocab| rows,
    not |tokens|): at 100 TB the explode+count shuffles token-partitioned
    and map-side combines; only the vocab-sized result is globally sorted.
    Rank ties broken by token so the ordering is total and engine-stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tt.ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded: all three run over the |vocab|-row token aggregate, not docs
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    cum = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    return counts.select(
        "token",
        "n",
        F.row_number().over(w).alias("rank"),
        floor6(F.sum("n").over(cum) / F.sum("n").over(total)).alias("cum_share"),
    )


TEXT_VOCAB_SQL = rf"""
WITH counts AS (
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents)
    GROUP BY token
)
SELECT token, n,
       row_number() OVER (ORDER BY n DESC, token) AS rank,
       {floor6_sql("sum(n) OVER (ORDER BY n DESC, token ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / sum(n) OVER ()")} AS cum_share
FROM counts
"""


# ---------------------------------------------------------------------------
# readability scoring
# ---------------------------------------------------------------------------


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch–Kincaid grade per document — the
    curriculum/difficulty signal a training-data pipeline buckets corpora
    by (alongside text_quality's surface heuristics and text_lm_score's
    LM perplexity proxy).

    Syllables are approximated by vowel-group counting (runs of
    ``[aeiouy]+`` in the lowercased text) — the standard dictionary-free
    heuristic; sentences by terminal-punctuation runs ``[.!?]+``; words by
    letter runs. All three are single ``regexp_count`` projections: one
    scan, zero shuffles, zero Python — the whole operator is a codegen'd
    map at 100 TB.

    Determinism: counts are exact integers; the two rate divisions and the
    affine score combinations are performed in the identical operation
    order by both engines, then floor-scaled to 4 dp (round() tie modes
    are engine-divergent; floor is not).
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_words = F.regexp_count(text, F.lit(r"[A-Za-z]+"))
    n_sents = F.regexp_count(text, F.lit(r"[.!?]+"))
    n_syll = F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+"))
    wps = n_words.cast("double") / F.greatest(n_sents, F.lit(1)).cast("double")
    spw = n_syll.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    flesch = 206.835 - 1.015 * wps - 84.6 * spw
    fk_grade = 0.39 * wps + 11.8 * spw - 15.59
    band = (
        F.when(flesch >= 70.0, F.lit("easy"))
        .when(flesch >= 50.0, F.lit("standard"))
        .otherwise(F.lit("difficult"))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        (F.floor(flesch * 1e4) / 1e4).alias("flesch"),
        (F.floor(fk_grade * 1e4) / 1e4).alias("fk_grade"),
        band.alias("band"),
    )


TEXT_READABILITY_SQL = r"""
WITH c AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
           len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
    FROM documents
),
r AS (
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(n_words AS DOUBLE) / CAST(greatest(n_sentences, 1) AS DOUBLE) AS wps,
           CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS spw
    FROM c
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e4) / 1e4 AS flesch,
       floor((0.39 * wps + 11.8 * spw - 15.59) * 1e4) / 1e4 AS fk_grade,
       CASE WHEN 206.835 - 1.015 * wps - 84.6 * spw >= 70.0 THEN 'easy'
            WHEN 206.835 - 1.015 * wps - 84.6 * spw >= 50.0 THEN 'standard'
            ELSE 'difficult' END AS band
FROM r
"""


# ---------------------------------------------------------------------------
# collocation mining — PMI-scored bigrams
# ---------------------------------------------------------------------------

_COLL_MIN_COUNT = 5


def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram collocations scored by pointwise mutual information —
    the phrase-mining pass a tokenizer/vocab pipeline runs to decide which
    adjacent-token pairs deserve merged entries (and a quality signal:
    boilerplate corpora have top-heavy PMI tables).

    PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ) with P from corpus counts:
    ln( (c_xy · T · T) / (B · c_x · c_y) ) — T total tokens, B total
    bigrams. Counts are exact longs from two explode→groupBy passes (both
    map-side combined, shuffle keyed on token/bigram — the vocabulary-sized
    result is all that ever sits on one node; nothing global except two
    scalar totals computed as broadcast 1-row frames). Pairs below
    ``_COLL_MIN_COUNT`` are dropped BEFORE the unigram joins, so the join
    probe side is the filtered collocation table, and the unigram side is
    vocabulary-sized — both broadcastable at any corpus scale.

    Determinism: the only float is the final single ln() over a ratio of
    exact integer products evaluated in identical order in both engines,
    floor-scaled to 6 dp.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tt.ws_tokens(F.col("text")).alias("w"))
    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = toks.select(
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 2),
                    lambda i: F.struct(
                        F.element_at("w", i + 1).alias("w1"),
                        F.element_at("w", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    t_total = uni.agg(F.sum("c").alias("t_tok"))
    b_total = big.agg(F.sum("n_xy").alias("t_big"))
    filtered = big.filter(F.col("n_xy") >= _COLL_MIN_COUNT)
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("n_x"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("n_y"))
    joined = (
        filtered.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(b_total))
    )
    num = F.col("n_xy").cast("double") * F.col("t_tok").cast("double") * F.col("t_tok").cast("double")
    den = F.col("t_big").cast("double") * F.col("n_x").cast("double") * F.col("n_y").cast("double")
    return joined.select(
        "w1",
        "w2",
        "n_xy",
        "n_x",
        "n_y",
        (F.floor(F.log(num / den) * 1e6) / 1e6).alias("pmi"),
    )


TEXT_COLLOCATIONS_SQL = rf"""
WITH toks AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
uni AS (
    SELECT tok, count(*) AS c
    FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok
),
bg AS (
    SELECT w[i + 1] AS w1, w[i + 2] AS w2
    FROM (SELECT w, unnest(generate_series(0, len(w) - 2)) AS i FROM toks)
),
big AS (SELECT w1, w2, count(*) AS n_xy FROM bg GROUP BY w1, w2),
tot AS (SELECT (SELECT sum(c) FROM uni) AS t_tok, (SELECT sum(n_xy) FROM big) AS t_big)
SELECT b.w1, b.w2, b.n_xy, u1.c AS n_x, u2.c AS n_y,
       floor(ln((CAST(b.n_xy AS DOUBLE) * CAST(t.t_tok AS DOUBLE) * CAST(t.t_tok AS DOUBLE))
                / (CAST(t.t_big AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) * 1e6) / 1e6 AS pmi
FROM big b
JOIN uni u1 ON u1.tok = b.w1
JOIN uni u2 ON u2.tok = b.w2
CROSS JOIN tot t
WHERE b.n_xy >= {_COLL_MIN_COUNT}
"""


# ---------------------------------------------------------------------------
# strided token chunking — the RAG / context-window splitter
# ---------------------------------------------------------------------------

_CHUNK_C = 64
_CHUNK_S = 48


def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-width token chunks with overlap —
    the context-window splitter feeding embedding/RAG indexing and packed
    pretraining (width ``_CHUNK_C`` tokens, stride ``_CHUNK_S``, overlap
    C−S). Chunk count per doc is m = 1 + ceil(max(0, n−C)/S), so the final
    chunk always reaches the end of the doc and no degenerate
    fully-contained trailing chunks are emitted.

    One scan, one explode of the per-doc start sequence, all slicing as
    array ops inside codegen — zero shuffles, zero Python; the chunk id is
    derivable (start/S) so downstream joins need no global ordering.

    Determinism: all integer arithmetic; chunk text is an exact
    ``concat_ws`` join of the token slice.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tt.ws_tokens(F.col("text")).alias("w")).select(
        "doc_id", "w", F.size("w").alias("n")
    )
    n = F.col("n")
    m = 1 + F.floor(
        (F.greatest(n - _CHUNK_C, F.lit(0)) + _CHUNK_S - 1) / F.lit(_CHUNK_S)
    ).cast("int")
    ex = base.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.transform(F.sequence(F.lit(0), m - 1), lambda i: i * _CHUNK_S)).alias(
            "chunk_start"
        ),
    )
    piece = F.slice("w", F.col("chunk_start") + 1, _CHUNK_C)
    return ex.select(
        "doc_id",
        (F.col("chunk_start") / _CHUNK_S).cast("long").alias("chunk_id"),
        "chunk_start",
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


TEXT_CHUNK_SQL = rf"""
WITH base AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
           len(string_split_regex(trim(text), '\s+')) AS n
    FROM documents
),
ex AS (
    SELECT doc_id, w, n,
           unnest(generate_series(0,
               CAST(floor((greatest(n - {_CHUNK_C}, 0) + {_CHUNK_S - 1}) / {_CHUNK_S}) AS INTEGER)
           )) * {_CHUNK_S} AS chunk_start
    FROM base
)
SELECT doc_id,
       CAST(chunk_start / {_CHUNK_S} AS BIGINT) AS chunk_id,
       chunk_start,
       len(w[chunk_start + 1 : chunk_start + {_CHUNK_C}]) AS n_chunk_tokens,
       array_to_string(w[chunk_start + 1 : chunk_start + {_CHUNK_C}], ' ') AS chunk_text
FROM ex
"""


# ---------------------------------------------------------------------------
# Shingle novelty — per-doc uniqueness / memorization-risk score
# ---------------------------------------------------------------------------


def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: the share of a doc's distinct 5-gram
    shingles that appear NOWHERE else in the corpus — the uniqueness /
    memorization-risk readout (novelty ≈ 1: fresh content worth keeping;
    novelty ≈ 0: the doc is assembled from corpus-common passages, a
    dedup/boilerplate candidate that pairwise dedup under-scores when no
    single partner crosses its threshold).

    Scale shape: tokens materialize in their own projection (the
    dedup._shingled O(n²)-retokenize lesson), the per-doc DISTINCT
    shingle explode feeds a map-side-combined document-frequency count,
    and the join back onto the exploded frame is co-partitioned on the
    shingle key — one explode, two fine-keyed shuffles, no pairwise
    join anywhere. Exact-integer counts; one double division.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tt.ws_tokens(F.col("text")).alias("w"))
    sh = toks.select(
        "doc_id", F.explode(F.array_distinct(tt.shingles(F.col("w")))).alias("s")
    )
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("long").alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            (F.floor(F.col("n_unique").cast("double") / F.col("n_shingles").cast("double") * 1e6) / 1e6).alias("novelty"),
        )
    )


TEXT_NOVELTY_SQL = """
WITH shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(w) - 4, 1) + 1),
               i -> array_to_string(w[i:i+4], ' '))) AS sh
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
freq AS (SELECT s, count(*) AS df FROM ex GROUP BY s)
SELECT e.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       floor(CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1e6) / 1e6 AS novelty
FROM ex e JOIN freq f ON f.s = e.s
GROUP BY e.doc_id
"""


# ---------------------------------------------------------------------------
# Zipf fit — vocabulary health via the rank-frequency power law
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100


def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Zipf fit of the corpus vocabulary: OLS slope of
    ln(freq) vs ln(rank) over the top-100 terms (natural language sits
    near −1; templated/boilerplate-heavy or synthetic corpora drift flat;
    a too-steep slope flags a few tokens dominating) plus the fit R² and
    the top-1 token share — the corpus-health readout a curation pass
    reads NEXT to the text_vocab curve.

    The vocabulary agg is text_vocab's shape (token-partitioned
    map-side-combined counts; only |vocab| rows sort); the top-100
    extraction is one TakeOrderedAndProject-sized window and the OLS
    moments fold over the rank-sorted array in pinned order (ln on
    identical doubles — the events_entropy convention). Exact-integer
    counts; divisions last.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tt.ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded: ranks the |vocab|-row token aggregate, not docs
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    top = counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= _ZIPF_TOP)
    tot = counts.agg(F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("vocab_size"))
    arr = top.agg(
        F.array_sort(F.collect_list(F.struct("rank", "n"))).alias("a"),
        F.max(F.when(F.col("rank") == 1, F.col("n"))).alias("top1_n"),
    )
    g = arr.join(F.broadcast(tot))
    k = F.size("a").cast("double")
    lx = F.transform("a", lambda s: F.log(s.rank.cast("double")))
    ly = F.transform("a", lambda s: F.log(s.n.cast("double")))

    def fsum(c):
        return F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x)

    sx, sy = fsum(lx), fsum(ly)
    sxx = fsum(F.transform(lx, lambda x: x * x))
    syy = fsum(F.transform(ly, lambda y: y * y))
    sxy = fsum(F.zip_with(lx, ly, lambda x, y: x * y))
    g = g.select(
        "a", "top1_n", "n_total", "vocab_size",
        k.alias("k"), sx.alias("sx"), sy.alias("sy"),
        sxx.alias("sxx"), syy.alias("syy"), sxy.alias("sxy"),
    )
    cov = F.col("sxy") / F.col("k") - (F.col("sx") / F.col("k")) * (F.col("sy") / F.col("k"))
    vx_ = F.col("sxx") / F.col("k") - (F.col("sx") / F.col("k")) * (F.col("sx") / F.col("k"))
    vy_ = F.col("syy") / F.col("k") - (F.col("sy") / F.col("k")) * (F.col("sy") / F.col("k"))
    slope = cov / vx_
    r2 = F.when(vy_ > 0, (cov / (F.sqrt(vx_) * F.sqrt(vy_))) * (cov / (F.sqrt(vx_) * F.sqrt(vy_))))
    return g.select(
        F.col("k").cast("int").alias("n_terms"),
        "vocab_size",
        F.col("n_total").cast("long").alias("n_tokens"),
        (F.floor(slope * 1e6) / 1e6).alias("zipf_slope"),
        (F.floor(r2 * 1e6) / 1e6).alias("fit_r2"),
        (F.floor(F.col("top1_n").cast("double") / F.col("n_total").cast("double") * 1e6) / 1e6).alias("top1_share"),
    )


TEXT_ZIPF_SQL = r"""
WITH counts AS (
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents)
    GROUP BY token
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS vocab_size FROM counts),
top AS (
    SELECT rank, n FROM (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM counts
    ) t WHERE rank <= 100
),
arr AS (
    SELECT list_sort(list(struct_pack(rank := rank, n := n))) AS a,
           max(CASE WHEN rank = 1 THEN n END) AS top1_n
    FROM top
),
m AS (
    SELECT a, top1_n, n_total, vocab_size,
           CAST(len(a) AS DOUBLE) AS k,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(a, s -> ln(CAST(s.rank AS DOUBLE)))), (x, y) -> x + y) AS sx,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(a, s -> ln(CAST(s.n AS DOUBLE)))), (x, y) -> x + y) AS sy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(a, s -> ln(CAST(s.rank AS DOUBLE)) * ln(CAST(s.rank AS DOUBLE)))), (x, y) -> x + y) AS sxx,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(a, s -> ln(CAST(s.n AS DOUBLE)) * ln(CAST(s.n AS DOUBLE)))), (x, y) -> x + y) AS syy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(a, s -> ln(CAST(s.rank AS DOUBLE)) * ln(CAST(s.n AS DOUBLE)))), (x, y) -> x + y) AS sxy
    FROM arr CROSS JOIN tot
)
SELECT CAST(k AS INT) AS n_terms, vocab_size, n_total AS n_tokens,
       floor((sxy / k - (sx / k) * (sy / k)) / (sxx / k - (sx / k) * (sx / k)) * 1e6) / 1e6 AS zipf_slope,
       CASE WHEN (syy / k - (sy / k) * (sy / k)) > 0
            THEN floor(((sxy / k - (sx / k) * (sy / k)) / (sqrt(sxx / k - (sx / k) * (sx / k)) * sqrt(syy / k - (sy / k) * (sy / k))))
                 * ((sxy / k - (sx / k) * (sy / k)) / (sqrt(sxx / k - (sx / k) * (sx / k)) * sqrt(syy / k - (sy / k) * (sy / k))))
                 * 1e6) / 1e6 END AS fit_r2,
       floor(CAST(top1_n AS DOUBLE) / CAST(n_total AS DOUBLE) * 1e6) / 1e6 AS top1_share
FROM m
"""


# ---------------------------------------------------------------------------
# lexical diversity — per-doc TTR / hapax share / Yule's K
# ---------------------------------------------------------------------------


def text_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-diversity profile: type-token ratio, hapax
    share (fraction of words used exactly once), and Yule's K = 10⁴·(Σ
    f_v·v² − N)/N² over the word-frequency spectrum — the length-robust
    repetitiveness constant (low K = diverse prose, high K = template /
    keyword-stuffed text). The per-doc complement of the corpus-level
    text_vocab / text_zipf: a curation filter reads THIS column, not the
    corpus curve (repetition-heavy docs degrade LMs; Gopher's quality
    rules threshold exactly these fractions).

    One explode of whitespace tokens → per-(doc, word) counts → per-doc
    frequency-spectrum aggregates — two map-side-combinable groupBys keyed
    by doc, no window, no join, all exact integers until three final
    divisions (floor-scaled). Scales as a word-count job."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tt.ws_tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("v"))
    g = wc.groupBy("doc_id").agg(
        F.sum("v").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
    )
    n = F.col("n_tokens").cast("double")
    yule_k = 1.0e4 * (F.col("sum_v2").cast("double") - n) / (n * n)
    return g.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        (F.floor(F.col("n_types").cast("double") / n * 1e6) / 1e6).alias("ttr"),
        (F.floor(F.col("n_hapax").cast("double") / n * 1e6) / 1e6).alias("hapax_share"),
        (F.floor(yule_k * 1e6) / 1e6).alias("yule_k"),
    )


TEXT_DIVERSITY_SQL = r"""
WITH words AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
),
wc AS (
    SELECT doc_id, w, count(*) AS v FROM words WHERE w != '' GROUP BY doc_id, w
),
g AS (
    SELECT doc_id,
           CAST(sum(v) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(v * v) AS BIGINT) AS sum_v2
    FROM wc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types, n_hapax,
       floor(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6) / 1e6 AS ttr,
       floor(CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6) / 1e6 AS hapax_share,
       floor(1e4 * (CAST(sum_v2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
             / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) * 1e6) / 1e6 AS yule_k
FROM g
"""


# ---------------------------------------------------------------------------
# code-likeness detection — corpus routing for code vs prose
# ---------------------------------------------------------------------------

_CODE_SYM_RATIO = 0.04
_CODE_IDENT_MIN = 4


def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-likeness screen per document: density of programming symbols
    ({}()[];=<>), snake_case / camelCase identifier hits, and digit share —
    the router that sends code to a code-aware tokenizer/dedup pipeline and
    prose to the text one (mixing them degrades both: code needs exact
    whitespace, prose needs sentence segmentation). Rule: code when the
    symbol density clears 4% of characters or ≥ 4 identifier-style hits.

    Shape: four ``regexp_count`` projections over one scan — zero shuffles,
    zero Python, whole-stage-codegen friendly (the readability pattern).
    Ratios are exact-count divisions, floor-scaled."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_sym = F.regexp_count(text, F.lit(r"[{}()\[\];=<>]"))
    n_digit = F.regexp_count(text, F.lit(r"[0-9]"))
    n_snake = F.regexp_count(text, F.lit(r"[a-z]+_[a-z]+"))
    n_camel = F.regexp_count(text, F.lit(r"[a-z][A-Z][a-z]"))
    d = docs.select(
        "doc_id",
        "n_chars",
        n_sym.cast("long").alias("n_symbols"),
        n_digit.cast("long").alias("n_digits"),
        (n_snake + n_camel).cast("long").alias("n_ident_hits"),
    )
    nc = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    sym_ratio = F.col("n_symbols").cast("double") / nc
    is_code = (sym_ratio >= _CODE_SYM_RATIO) | (F.col("n_ident_hits") >= _CODE_IDENT_MIN)
    return d.select(
        "doc_id",
        "n_symbols",
        "n_digits",
        "n_ident_hits",
        (F.floor(sym_ratio * 1e6) / 1e6).alias("symbol_ratio"),
        (F.floor(F.col("n_digits").cast("double") / nc * 1e6) / 1e6).alias("digit_ratio"),
        F.when(is_code, F.lit("code")).otherwise(F.lit("prose")).alias("verdict"),
    )


TEXT_CODE_DETECT_SQL = f"""
WITH d AS (
    SELECT doc_id, n_chars,
           CAST(len(regexp_extract_all(text, '[{{}}()\\[\\];=<>]')) AS BIGINT) AS n_symbols,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[a-z]+_[a-z]+'))
                + len(regexp_extract_all(text, '[a-z][A-Z][a-z]')) AS BIGINT) AS n_ident_hits
    FROM documents
)
SELECT doc_id, n_symbols, n_digits, n_ident_hits,
       floor(CAST(n_symbols AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 1e6) / 1e6 AS symbol_ratio,
       floor(CAST(n_digits AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 1e6) / 1e6 AS digit_ratio,
       CASE WHEN CAST(n_symbols AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) >= {_CODE_SYM_RATIO!r}
                 OR n_ident_hits >= {_CODE_IDENT_MIN}
            THEN 'code' ELSE 'prose' END AS verdict
FROM d
"""


# ---------------------------------------------------------------------------
# instruction-style detection — SFT-data mining router
# ---------------------------------------------------------------------------

_INSTR_MIN_SIGNALS = 2


def text_instruction_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-style screen per document — the router that mines
    SFT/chat-style material out of a web corpus (the counterpart of
    text_code_detect's code-vs-prose split): counts of question marks,
    imperative sentence openers (Do/Make/Write/List/Explain/Describe/
    Use/Find/Create/Follow...), enumerated-list markers (1. / 2. /
    step N), and second-person address ("you/your"). A document clearing
    ≥ 2 distinct signal families routes to the instruction-mining
    pipeline.

    Four regexp_count projections over one scan — zero shuffles, zero
    Python (the readability/code_detect shape). Counts exact; no floats
    anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_q = F.regexp_count(text, F.lit(r"\?"))
    n_imp = F.regexp_count(
        text,
        F.lit(r"(?i)(^|[.!?]\s+)(do|make|write|list|explain|describe|use|find|create|follow|add|remove|select|click|choose)\b"),
    )
    n_enum = F.regexp_count(text, F.lit(r"(^|\s)\d+[.)]\s"))
    n_you = F.regexp_count(F.lower(text), F.lit(r"\byou(r)?\b"))
    d = docs.select(
        "doc_id",
        n_q.cast("long").alias("n_questions"),
        n_imp.cast("long").alias("n_imperatives"),
        n_enum.cast("long").alias("n_list_markers"),
        n_you.cast("long").alias("n_second_person"),
    )
    signals = (
        (F.col("n_questions") > 0).cast("int")
        + (F.col("n_imperatives") > 0).cast("int")
        + (F.col("n_list_markers") > 0).cast("int")
        + (F.col("n_second_person") > 0).cast("int")
    )
    return d.select(
        "doc_id", "n_questions", "n_imperatives", "n_list_markers", "n_second_person",
        signals.alias("n_signal_families"),
        F.when(signals >= _INSTR_MIN_SIGNALS, F.lit("instruction")).otherwise(F.lit("plain")).alias("verdict"),
    )


TEXT_INSTRUCTION_DETECT_SQL = rf"""
WITH d AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\?')) AS BIGINT) AS n_questions,
           CAST(len(regexp_extract_all(text,
               '(?i)(^|[.!?]\s+)(do|make|write|list|explain|describe|use|find|create|follow|add|remove|select|click|choose)\b')) AS BIGINT) AS n_imperatives,
           CAST(len(regexp_extract_all(text, '(^|\s)\d+[.)]\s')) AS BIGINT) AS n_list_markers,
           CAST(len(regexp_extract_all(lower(text), '\byou(r)?\b')) AS BIGINT) AS n_second_person
    FROM documents
)
SELECT doc_id, n_questions, n_imperatives, n_list_markers, n_second_person,
       CAST(CAST(n_questions > 0 AS INT) + CAST(n_imperatives > 0 AS INT)
            + CAST(n_list_markers > 0 AS INT) + CAST(n_second_person > 0 AS INT) AS INT)
           AS n_signal_families,
       CASE WHEN CAST(n_questions > 0 AS INT) + CAST(n_imperatives > 0 AS INT)
                 + CAST(n_list_markers > 0 AS INT) + CAST(n_second_person > 0 AS INT)
                 >= {_INSTR_MIN_SIGNALS}
            THEN 'instruction' ELSE 'plain' END AS verdict
FROM d
"""
