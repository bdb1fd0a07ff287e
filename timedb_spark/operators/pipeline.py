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

from pyspark.sql import DataFrame, SparkSession, Window
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

    # stage 2: quality floor (same formula as operators.text.text_quality,
    # including its floor(x*1e6+0.5)/1e6 rounding — round(x,6) half-mode
    # divergence between the engines flipped a 6th decimal at sf0.1)
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    n_tok = F.size(tt.ws_tokens(text))
    punct_ratio = tt.punct_count(text).cast("double") / F.greatest(F.length(text), F.lit(1))
    stop_ratio = tt.stopword_count(text, tt.LANG_STOPWORDS["en"]).cast("double") / F.greatest(n_tok, F.lit(1))
    len_score = F.least(F.length(text).cast("double") / F.lit(200.0), F.lit(1.0))
    score = r6(
        0.5 * len_score
        + 0.25 * (1 - F.least(r6(punct_ratio) * 10, F.lit(1.0)))
        + 0.25 * F.least(r6(stop_ratio) * 5, F.lit(1.0))
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
    -- floor(x*1e6+0.5)/1e6, not round(x,6): identical halfway mode as the
    -- Spark side (see text_quality docstring)
    SELECT doc_id, lang, source,
           floor((0.5 * least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               + 0.25 * (1 - least(floor(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                                         / greatest(length(text), 1) * 1e6 + 0.5) / 1e6 * 10, 1.0))
               + 0.25 * least(floor(CAST(len(regexp_extract_all(lower(text), '{tt.LANG_STOPWORDS["en"]}')) AS DOUBLE)
                                    / greatest(len(string_split_regex(trim(text), '\s+')), 1) * 1e6 + 0.5) / 1e6 * 5, 1.0)) * 1e6 + 0.5) / 1e6 AS quality_score
    FROM kept
)
SELECT doc_id, lang, source, quality_score,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
            ELSE 'train' END AS split
FROM scored
WHERE quality_score >= {QUALITY_FLOOR}
"""


# ---------------------------------------------------------------------------
# benchmark-contamination detection
# ---------------------------------------------------------------------------

_CONTAM_N = 8
_CONTAM_MIN_SHARED = 3


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination scan — the pretraining-hygiene gate: flag
    corpus documents sharing ≥ 3 distinct word-8-gram shingles with any
    benchmark document (benchmark = doc_id % 97, the held-out eval slice).

    Scale shape: the benchmark side is ~1% of the corpus → its exploded
    shingle set BROADCASTS; the corpus side streams through one shuffle on
    (doc, bench) for the overlap count. Contaminated docs surface with the
    offending benchmark id and the shared-shingle count — the decontam
    delete-list, not just a boolean. 8-grams (vs the dedup 5-grams) bias
    toward verbatim leakage over topical similarity.
    """
    from timedb_spark.operators.dedup import doc_corpus

    corpus = doc_corpus(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    shingled = corpus.select(
        "doc_id", F.array_distinct(tt.shingles(toks, _CONTAM_N)).alias("sh")
    )
    is_bench = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 100000)
    bench_sh = (
        shingled.filter(is_bench)
        .select(F.col("doc_id").alias("bench_doc_id"), F.explode("sh").alias("s"))
    )
    scan_sh = shingled.filter(~is_bench).select("doc_id", F.explode("sh").alias("s"))
    return (
        scan_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= _CONTAM_MIN_SHARED)
    )


from timedb_spark.operators.dedup import DOC_CORPUS_SQL as _CORPUS_SQL  # noqa: E402

CONTAMINATION_SQL = rf"""
WITH corpus AS ({_CORPUS_SQL}),
shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(w) - {_CONTAM_N - 1}, 1) + 1),
               i -> array_to_string(w[i:i+{_CONTAM_N - 1}], ' '))) AS sh
    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM corpus)
),
bench AS (
    SELECT doc_id AS bench_doc_id, unnest(sh) AS s FROM shingled
    WHERE doc_id % 97 = 0 AND doc_id < 100000
),
scan AS (
    SELECT doc_id, unnest(sh) AS s FROM shingled
    WHERE NOT (doc_id % 97 = 0 AND doc_id < 100000)
)
SELECT scan.doc_id, bench.bench_doc_id, count(*) AS n_shared_shingles
FROM scan JOIN bench USING (s)
GROUP BY 1, 2
HAVING count(*) >= {_CONTAM_MIN_SHARED}
"""


# ---------------------------------------------------------------------------
# table profiling (the data-quality scan)
# ---------------------------------------------------------------------------

#: lineitem columns profiled (int / string / timestamp — one of each shape).
PROFILE_COLS = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus", "l_shipdate"]


def profile_table(spark: SparkSession, sf_dir: str, exact: bool = False) -> DataFrame:
    """Per-column profile of ``lineitem`` in ONE scan: row count, null
    count, distinct count, min/max (computed on the NATIVE type, then
    stringified — a string-side min would order ints lexicographically).
    The first thing a data-quality pipeline runs against a new drop.

    Distinct counts are ``approx_count_distinct`` (HLL++, rsd 2%) BY
    DEFAULT: N exact multi-distincts in one agg make Spark plan an Expand
    that multiplies every input row ~(3N+2)× into the shuffle — the 100 TB
    scale-killer for this query. HLL sketches are map-side combinable, so
    the approx plan is one ordinary partial/final agg with no Expand (plan
    shape pinned in tests/test_plan_shape.py). ``exact=True`` restores
    exact counts for small data / oracle comparison.

    The exact path (r13) avoids the Expand TOO: one multi-distinct agg
    plans Expand(6×) feeding a SortAggregate (string min/max buffers are
    not Tungsten-mutable, so the whole widened stream gets sorted —
    measured 8-12 s at sf0.1). Instead, each column's exact distinct count
    AND its min/max come from a per-column ``distinct()`` hash aggregate
    (min/max over the distinct set equal min/max over the base; the only
    sort-based agg left runs over the tiny distinct frame), crossed into
    the base row-count/null-count pass with 1-row broadcast joins.
    Measured: 8.1 s → 1.1 s at sf0.1, values identical. Six column-pruned
    scans replace the 6× row multiplication — at 100 TB each scan reads
    one column, and nothing ever sorts the full table."""
    li = load_table(spark, sf_dir, "lineitem")
    if exact:
        one = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls") for c in PROFILE_COLS],
        )
        for c in PROFILE_COLS:
            percol = (
                li.select(c)
                .distinct()
                .agg(
                    # count(col) over the distinct values == count_distinct
                    # (both skip NULL; distinct keeps at most one NULL row).
                    F.count(F.col(c)).alias(f"{c}__nd"),
                    F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                    F.max(F.col(c)).cast("string").alias(f"{c}__max"),
                )
            )
            one = one.join(F.broadcast(percol))
    else:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in PROFILE_COLS:
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                F.approx_count_distinct(F.col(c), rsd=0.02).alias(f"{c}__nd"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


# CAST on the null-count sums: integer sum() widens to HUGEINT in DuckDB;
# Spark emits bigint and the gate hash is type-sensitive.
_PROFILE_AGGS = ", ".join(
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}__nulls, "
    f"count(DISTINCT {c}) AS {c}__nd, "
    f"CAST(min({c}) AS VARCHAR) AS {c}__min, "
    f"CAST(max({c}) AS VARCHAR) AS {c}__max"
    for c in PROFILE_COLS
)

_PROFILE_ROWS = " UNION ALL ".join(
    f"SELECT '{c}' AS column, n_rows, {c}__nulls AS n_nulls, {c}__nd AS n_distinct, "
    f"{c}__min AS min_value, {c}__max AS max_value FROM one"
    for c in PROFILE_COLS
)

PROFILE_TABLE_SQL = f"""
WITH one AS (SELECT count(*) AS n_rows, {_PROFILE_AGGS} FROM lineitem)
{_PROFILE_ROWS}
"""


# ---------------------------------------------------------------------------
# distribution drift (PSI) — the train/val data-quality gate
# ---------------------------------------------------------------------------

_DRIFT_BIN_W = 50.0
_DRIFT_BINS = 10  # bins 0..9 cover [0, 500); bin 9 also absorbs overflow
_DRIFT_EPS = 1e-6  # empty-bin floor (standard PSI practice)


def profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index report between two event populations
    (click vs purchase value distributions — the stand-in for the
    train-vs-validation / yesterday-vs-today drift check every training
    pipeline gates on). One scan: fixed-width value bins, conditional
    counts per side, 1-row totals broadcast back, per-bin PSI term
    ``(p_b - p_a) * ln(p_b / p_a)`` with the standard epsilon floor for
    empty bins. Σ psi_term > 0.2 is the usual "investigate" threshold.

    Scale shape: a single groupBy on a 10-value bin key (map-side
    partial), everything after it is arithmetic on ≤10 rows. Counts are
    exact integers; the two divisions and one ln round to 6 against the
    oracle."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    bin_col = F.least(F.floor(F.col("value") / _DRIFT_BIN_W), F.lit(_DRIFT_BINS - 1)).cast("int")
    counts = ev.groupBy(bin_col.alias("bin")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_b"),
    )
    totals = counts.agg(F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b"))
    j = counts.join(F.broadcast(totals))
    p_a = F.greatest(F.col("n_a") / F.col("t_a"), F.lit(_DRIFT_EPS))
    p_b = F.greatest(F.col("n_b") / F.col("t_b"), F.lit(_DRIFT_EPS))
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round((p_b - p_a) * F.log(p_b / p_a), 6).alias("psi_term"),
    )


PROFILE_DRIFT_SQL = f"""
WITH ev AS (
    SELECT CAST(least(floor(value / {_DRIFT_BIN_W}), {_DRIFT_BINS - 1}) AS INT) AS bin,
           event_type
    FROM events WHERE event_type IN ('click', 'purchase')
),
counts AS (
    SELECT bin,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM ev GROUP BY bin
),
t AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a, CAST(sum(n_b) AS BIGINT) AS t_b FROM counts)
SELECT bin, n_a, n_b,
       round(greatest(CAST(n_a AS DOUBLE) / t_a, {_DRIFT_EPS}), 6) AS p_a,
       round(greatest(CAST(n_b AS DOUBLE) / t_b, {_DRIFT_EPS}), 6) AS p_b,
       round((greatest(CAST(n_b AS DOUBLE) / t_b, {_DRIFT_EPS}) - greatest(CAST(n_a AS DOUBLE) / t_a, {_DRIFT_EPS}))
             * ln(greatest(CAST(n_b AS DOUBLE) / t_b, {_DRIFT_EPS}) / greatest(CAST(n_a AS DOUBLE) / t_a, {_DRIFT_EPS})), 6) AS psi_term
FROM counts, t
"""


# ---------------------------------------------------------------------------
# Per-source corpus quality dashboard
# ---------------------------------------------------------------------------


def profile_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard: doc volume, length stats, language
    mix (dominant language + its share, deterministic count-then-name
    tiebreak), and within-source exact-duplicate rate — the one-scan
    overview a curation pipeline renders per ingestion feed to decide
    which sources to keep, re-crawl, or re-filter.

    Scale shape: two fine-keyed map-side-combined groupBys ((source,
    lang) for the mix, (source, md5(text)) for the dup rate) rolled up to
    source granularity and joined on the tiny source key — no broadcast
    needed, no text shuffle beyond the first hash projection. Exact
    integer counts; divisions at the end, identical op order.
    """
    docs = load_table(spark, sf_dir, "documents")

    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    lang = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("lc"))
    top = (
        lang.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.col("lc").desc(), F.col("lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("lc").alias("top_lc"))
    )
    nlang = lang.groupBy("source").agg(F.count(F.lit(1)).alias("n_langs"))
    dups = (
        docs.select("source", F.md5(F.col("text")).alias("h"))
        .groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("hc"))
        .groupBy("source")
        .agg(F.sum(F.when(F.col("hc") > 1, F.col("hc")).otherwise(0)).alias("n_dup_docs"))
    )
    return (
        base.join(top, "source")
        .join(nlang, "source")
        .join(dups, "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            (F.floor(F.col("total_chars").cast("double") / F.col("n_docs").cast("double") * 1e6) / 1e6).alias("avg_chars"),
            "n_langs",
            "top_lang",
            (F.floor(F.col("top_lc").cast("double") / F.col("n_docs").cast("double") * 1e6) / 1e6).alias("top_lang_share"),
            F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
            (F.floor(F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double") * 1e6) / 1e6).alias("dup_rate"),
        )
    )


PROFILE_SOURCES_SQL = """
WITH base AS (
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
),
lang AS (SELECT source, lang, count(*) AS lc FROM documents GROUP BY source, lang),
top AS (
    SELECT source, lang AS top_lang, lc AS top_lc FROM (
        SELECT *, row_number() OVER (PARTITION BY source ORDER BY lc DESC, lang) AS rn
        FROM lang
    ) t WHERE rn = 1
),
nlang AS (SELECT source, count(*) AS n_langs FROM lang GROUP BY source),
dups AS (
    SELECT source, CAST(sum(CASE WHEN hc > 1 THEN hc ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM (SELECT source, md5(text) AS h, count(*) AS hc FROM documents GROUP BY source, md5(text)) t
    GROUP BY source
)
SELECT b.source, b.n_docs, b.total_chars,
       floor(CAST(b.total_chars AS DOUBLE) / CAST(b.n_docs AS DOUBLE) * 1e6) / 1e6 AS avg_chars,
       nl.n_langs, tp.top_lang,
       floor(CAST(tp.top_lc AS DOUBLE) / CAST(b.n_docs AS DOUBLE) * 1e6) / 1e6 AS top_lang_share,
       d.n_dup_docs,
       floor(CAST(d.n_dup_docs AS DOUBLE) / CAST(b.n_docs AS DOUBLE) * 1e6) / 1e6 AS dup_rate
FROM base b
JOIN top tp ON tp.source = b.source
JOIN nlang nl ON nl.source = b.source
JOIN dups d ON d.source = b.source
"""


# ---------------------------------------------------------------------------
# declarative data-quality rules — the Deequ-style single-scan check suite
# ---------------------------------------------------------------------------

#: (rule name, violation-predicate SQL over events) — ONE expression string
#: per rule, shared verbatim by the Spark plan and the DuckDB oracle so the
#: rule SEMANTICS cannot drift between engines.
_DQ_RULES: list[tuple[str, str]] = [
    ("value_not_null", "value IS NULL"),
    ("value_non_negative", "value < 0"),
    ("value_below_cap", "value > 1000000"),
    ("ts_not_null", "ts IS NULL"),
    ("event_type_in_vocab", "event_type NOT IN ('click','view','purchase','signup','error')"),
    ("user_id_non_negative", "user_id < 0"),
]


def pipeline_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite over the events feed (the Deequ /
    dbt-test shape): each rule is a violation predicate; the report is one
    row per rule with violation count, share, and pass/fail — plus a
    uniqueness rule (event_id) that needs an aggregate, not a predicate.
    The ingest gate a pipeline runs BEFORE anything downstream trusts the
    batch (io/ingest.py quarantines malformed ROWS at parse time; this
    checks semantic invariants across the PARSED batch).

    Shape: every predicate folds into ONE single-scan aggregate (conditional
    sums — map-side combinable, no per-rule pass), then unpivots via stack;
    uniqueness rides the same scan as count - approx-free exact distinct.
    The oracle evaluates the IDENTICAL predicate strings. At 100 TB this is
    one scan, one 1-row shuffle, K output rows."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(name)
        for name, pred in _DQ_RULES
    ]
    one = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("event_id")).alias("n_ids"),
        *aggs,
    )
    one = one.withColumn(
        "event_id_unique", (F.col("n_rows") - F.col("n_ids")).cast("long")
    )
    names = [name for name, _ in _DQ_RULES] + ["event_id_unique"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    rows = one.selectExpr("n_rows", f"stack({len(names)}, {stack}) AS (rule, n_violations)")
    share = F.col("n_violations").cast("double") / F.col("n_rows").cast("double")
    return rows.select(
        "rule",
        F.col("n_rows").cast("long").alias("n_rows"),
        "n_violations",
        (F.floor(share * 1e6) / 1e6).alias("violation_share"),
        F.when(F.col("n_violations") == 0, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
    )


def _dq_rules_sql() -> str:
    rule_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, pred in _DQ_RULES
    )
    names = [name for name, _ in _DQ_RULES] + ["event_id_unique"]
    rows = " UNION ALL ".join(
        f"SELECT '{n}' AS rule, n_rows, {n} AS n_violations FROM one" for n in names
    )
    return f"""
WITH one AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS event_id_unique,
           {rule_cols}
    FROM events
),
r AS ({rows})
SELECT rule, n_rows, n_violations,
       floor(CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1e6) / 1e6 AS violation_share,
       CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM r
"""


PIPELINE_DQ_RULES_SQL = _dq_rules_sql()


# ---------------------------------------------------------------------------
# dataset card — the one-row corpus summary block
# ---------------------------------------------------------------------------

_CARD_SHORT_CHARS = 200


def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card stats block as ONE row: corpus volume (docs,
    sources, languages, chars, whitespace tokens), exact-duplicate rate,
    dominant language + share, mean document length, and the short-doc
    share — the summary a curation team publishes with every training-data
    release (Datasheets for Datasets / HF dataset-card conventions), here
    as a single reproducible query instead of a hand-assembled table.

    Scale shape: one scan feeding a global aggregate (counts, char/token
    sums — all map-side combined), one (lang) rollup for the dominant
    language, one md5-keyed distinct count for the dup rate (the
    profile_sources hashing pattern at corpus grain). All counters exact
    integers; ratios are final floor-scaled divisions."""
    docs = load_table(spark, sf_dir, "documents")
    from timedb_spark.functions import texttools as tt

    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(tt.ws_tokens(F.col("text"))).cast("long")).alias("total_tokens_ws"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.sum(F.when(F.col("n_chars") < _CARD_SHORT_CHARS, 1).otherwise(0)).cast("long").alias("n_short"),
    )
    lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("lc"))
    top = (
        lang.orderBy(F.col("lc").desc(), F.col("lang")).limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("lc").alias("top_lc"))
    )
    j = base.crossJoin(F.broadcast(top))
    nd = F.col("n_docs").cast("double")
    return j.select(
        "n_docs",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        "total_tokens_ws",
        (F.floor((1.0 - F.col("n_unique_texts").cast("double") / nd) * 1e6) / 1e6).alias("dup_rate"),
        "top_lang",
        (F.floor(F.col("top_lc").cast("double") / nd * 1e6) / 1e6).alias("top_lang_share"),
        (F.floor(F.col("total_chars").cast("double") / nd * 1e6) / 1e6).alias("mean_chars"),
        (F.floor(F.col("n_short").cast("double") / nd * 1e6) / 1e6).alias("short_share"),
    )


PIPELINE_DATASET_CARD_SQL = rf"""
WITH base AS (
    SELECT count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens_ws,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
           CAST(sum(CASE WHEN n_chars < {_CARD_SHORT_CHARS} THEN 1 ELSE 0 END) AS BIGINT) AS n_short
    FROM documents
),
top AS (
    SELECT lang AS top_lang, count(*) AS top_lc
    FROM documents GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1
)
SELECT n_docs, n_sources, n_langs, total_chars, total_tokens_ws,
       floor((1.0 - CAST(n_unique_texts AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1e6) / 1e6 AS dup_rate,
       top_lang,
       floor(CAST(top_lc AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6) / 1e6 AS top_lang_share,
       floor(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6) / 1e6 AS mean_chars,
       floor(CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6) / 1e6 AS short_share
FROM base CROSS JOIN top
"""


# ---------------------------------------------------------------------------
# semantic contamination — embedding-space decontamination twin
# ---------------------------------------------------------------------------

_SEM_CONTAM_TAU = 0.92
_SEM_BENCH_MOD = 11


def contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space test-set contamination scan — the semantic twin of
    contamination_check (which catches VERBATIM 8-gram leakage; paraphrased
    or lightly-edited leaks evade n-grams but not the encoder): flag corpus
    vectors whose cosine to any benchmark vector (vec_id % 11, the held-out
    slice) clears τ = 0.92, with the offending benchmark id and the exact
    score — the semantic decontam delete-list (Yang et al. 2023's rephrased
    contamination finding made this pass standard next to the n-gram one).

    Scale shape is contamination_check's verbatim: the benchmark side is
    ~9% of vectors → BROADCAST; the corpus side streams through one
    projection of exact quantized-integer dot products — no shuffle of the
    big side at all (a window picks each doc's worst offender, keyed by the
    corpus vector). At 100 TB: benchmark embeddings always fit memory;
    the scan is one pass."""
    from timedb_spark.functions import vectors as vx

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", vx.quantize(F.col("embedding")).alias("q")
    )
    is_bench = F.col("vec_id") % _SEM_BENCH_MOD == 0
    # norms are per-ROW; inlined cosine_q recomputed both (plus the
    # quantize transform) per PAIR — the dedup_embedding r14 finding.
    # The broadcast materializes the bench projection; the streamed scan
    # side is pinned with a lazy localCheckpoint (vec-count rows).
    bench = vecs.filter(is_bench).select(
        F.col("vec_id").alias("bench_id"),
        F.col("q").alias("bq"),
        F.sqrt(vx.norm_sq_q(F.col("q")).cast("double")).alias("bnq"),
    )
    scan = vecs.filter(~is_bench).select(
        "vec_id", "q", F.sqrt(vx.norm_sq_q(F.col("q")).cast("double")).alias("nq")
    ).localCheckpoint(eager=False)
    cos = vx.dot_q(F.col("q"), F.col("bq")) / (F.col("nq") * F.col("bnq"))
    scored = scan.join(F.broadcast(bench)).select("vec_id", "bench_id", cos.alias("_cos"))
    from pyspark.sql import Window as _W

    # every vector's WORST offender rides the output (hash-checking real
    # values even on a clean corpus); the verdict column is the decision
    w = _W.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("bench_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "bench_id",
            (F.floor(F.col("_cos") * 1e6) / 1e6).alias("cosine"),
            F.when(F.col("_cos") >= _SEM_CONTAM_TAU, F.lit("contaminated"))
            .otherwise(F.lit("clean")).alias("verdict"),
        )
    )


from timedb_spark.functions import vectors as _vx_sql  # noqa: E402

CONTAMINATION_SEMANTIC_SQL = f"""
WITH vecs AS (
    SELECT vec_id, {{q}} AS q FROM embeddings
),
bench AS (
    SELECT vec_id AS bench_id, q AS bq FROM vecs WHERE vec_id % {_SEM_BENCH_MOD} = 0
),
scored AS (
    SELECT v.vec_id, b.bench_id, {{cos}} AS c
    FROM vecs v CROSS JOIN bench b
    WHERE v.vec_id % {_SEM_BENCH_MOD} != 0
),
hits AS (
    SELECT vec_id, bench_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, bench_id) AS rn
    FROM scored
)
SELECT vec_id, bench_id, floor(c * 1e6) / 1e6 AS cosine,
       CASE WHEN c >= {_SEM_CONTAM_TAU!r} THEN 'contaminated' ELSE 'clean' END AS verdict
FROM hits WHERE rn = 1
""".format(
    q=_vx_sql.QUANTIZE_SQL.format(v="embedding"),
    cos=_vx_sql.cosine_q_sql("v.q", "b.bq"),
)
