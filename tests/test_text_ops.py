"""Unit tests for the text repetition + PII operators.

The synthetic documents corpus contains no PII, so the driver-facing parity
check only proves the no-op path; the POSITIVE path — crafted emails / SSNs
/ IPs / phones detected and redacted identically in Spark and DuckDB — is
pinned here with a DuckDB mini-oracle over the same crafted rows.
"""

import os

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from timedb_spark.operators import text as tx

_PII_ROWS = [
    (1, "contact john.doe@example.com or 192.168.1.1"),
    (2, "ssn 123-45-6789 phone +1 555 123 4567"),
    (3, "clean text with no identifiers at all"),
    (4, "two mails a@b.io c.d@e-f.org and 10.0.0.255 10.1.2.3"),
]


def _pii_frame(spark):
    return spark.createDataFrame(_PII_ROWS, "doc_id long, text string")


def test_pii_counts_hand_computed(spark):
    df = _pii_frame(spark)
    counts = {
        k: F.size(F.regexp_extract_all(F.col("text"), F.lit(p), 0)).alias(k)
        for k, p in tx.PII_PATTERNS.items()
    }
    got = {r.doc_id: r for r in df.select("doc_id", *counts.values()).collect()}
    assert (got[1].email, got[1].ipv4, got[1].ssn, got[1].phone) == (1, 1, 0, 0)
    # the SSN digit-run also matches the loose phone shape — counts are
    # independent per kind (scrub order is what disambiguates redaction)
    assert (got[2].email, got[2].ipv4, got[2].ssn, got[2].phone) == (0, 0, 1, 2)
    assert (got[3].email, got[3].ipv4, got[3].ssn, got[3].phone) == (0, 0, 0, 0)
    assert (got[4].email, got[4].ipv4) == (2, 2)


def test_pii_scrub_hand_computed(spark):
    df = _pii_frame(spark)
    got = {r.doc_id: r.clean for r in df.select("doc_id", tx.pii_scrub(F.col("text")).alias("clean")).collect()}
    assert got[1] == "contact <EMAIL> or <IPV4>"
    assert got[2] == "ssn <SSN> phone <PHONE>"
    assert got[3] == _PII_ROWS[2][1]
    assert got[4] == "two mails <EMAIL> <EMAIL> and <IPV4> <IPV4>"


def test_pii_spark_matches_duckdb_on_positive_rows(spark):
    """Cross-engine regex parity on rows that actually contain PII — the
    guarantee the corpus-level gate can't give."""
    df = _pii_frame(spark)
    counts = {
        k: F.size(F.regexp_extract_all(F.col("text"), F.lit(p), 0)).alias(f"n_{k}")
        for k, p in tx.PII_PATTERNS.items()
    }
    spark_rows = sorted(
        tuple(r) for r in df.select("doc_id", *counts.values(), tx.pii_scrub(F.col("text")).alias("clean")).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_PII_ROWS, columns=["doc_id", "text"]))
    scrub = "text"
    for kind in tx.PII_SCRUB_ORDER:
        scrub = f"regexp_replace({scrub}, '{tx.PII_PATTERNS[kind]}', '<{kind.upper()}>', 'g')"
    cols = ", ".join(f"len(regexp_extract_all(text, '{p}')) AS n_{k}" for k, p in tx.PII_PATTERNS.items())
    duck_rows = sorted(tuple(r) for r in con.sql(f"SELECT doc_id, {cols}, {scrub} AS clean FROM documents").fetchall())
    assert spark_rows == duck_rows


def test_repetition_hand_computed(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b a b c", "x y z w"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [9, 7],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in tx.text_repetition(spark, d).collect()}
    d1 = out[1]  # bigrams: ab ba ab bc → top "a b"×2 of 4, 3 distinct
    assert (d1.n_bigrams, d1.top_bigram_n) == (4, 2)
    assert (d1.top_bigram_frac, d1.dup_bigram_frac) == (0.5, 0.25)
    assert (d1.n_trigrams, d1.dup_trigram_frac) == (3, 0.0)
    d2 = out[2]  # all unique
    assert (d2.n_bigrams, d2.top_bigram_n, d2.dup_bigram_frac) == (3, 1, 0.0)


def test_lm_score_signal_direction(spark, tmp_path):
    """A doc repeating corpus-common phrasing scores a high mean bigram
    frequency; a doc of corpus-unique gibberish scores singleton_frac 1."""
    import pandas as pd

    from timedb_spark.operators.text import text_lm_score

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat sat on the mat",
                "the cat sat on the mat",
                "the cat sat on the mat",
                "zx qv plorf wibble snarf",
            ],
        }
    )
    d = tmp_path / "sf_lm"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    out = {r.doc_id: r for r in text_lm_score(spark, str(d)).collect()}
    assert out[3].singleton_frac == 1.0
    assert out[0].mean_bigram_freq == 3.0  # every bigram appears in 3 docs
    assert out[0].singleton_frac == 0.0


def test_readability_hand_computed(spark, tmp_path):
    """text_readability on two planted documents: counts (letter-run words,
    vowel-group syllables, terminal-punct sentences) and the Flesch / FK
    affine combinations verified against by-hand arithmetic."""
    import math

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            # doc 1: "The cat sat. It ran!" -> 5 words, 2 sentences,
            # vowel groups: e,a,a,I,a -> 5 syllables
            # doc 2: no terminal punctuation -> sentence floor of 1
            "text": ["The cat sat. It ran!", "incomprehensibility"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [20, 19],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in tx.text_readability(spark, d).collect()}

    d1 = out[1]
    assert (d1.n_words, d1.n_sentences, d1.n_syllables) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    fl = 206.835 - 1.015 * wps - 84.6 * spw
    assert d1.flesch == math.floor(fl * 1e4) / 1e4
    assert d1.fk_grade == math.floor((0.39 * wps + 11.8 * spw - 15.59) * 1e4) / 1e4
    assert d1.band == "easy"  # ~119: trivially easy text

    # i-n-c-o-m-p-r-e-h-e-n-s-i-b-i-l-i-t-y: vowel groups i,o,e,e,i,i,i,y
    d2 = out[2]
    assert (d2.n_words, d2.n_sentences, d2.n_syllables) == (1, 0, 8)
    wps2, spw2 = 1 / 1, 8 / 1  # sentence floor kicks in
    fl2 = 206.835 - 1.015 * wps2 - 84.6 * spw2
    assert d2.flesch == math.floor(fl2 * 1e4) / 1e4
    assert d2.band == "difficult"  # deeply negative score


def test_text_novelty_hand_corpus(spark, tmp_path):
    import math

    """Planted corpus: a doc duplicated verbatim has novelty 0 (every
    shingle shared), a fully unique doc has novelty 1, and a half-stitched
    doc replays the exact shingle arithmetic."""
    import os

    import pandas as pd

    a = "alpha beta gamma delta epsilon zeta eta theta"        # 8 tokens
    u = "red orange yellow green blue indigo violet ultra"     # unique doc
    half = a + " " + "one two three four five six seven eight" # stitched
    rows = [(1, a), (2, a), (3, u), (4, half)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import text as tx

    got = {r.doc_id: r for r in tx.text_novelty(spark, d).collect()}

    def sh5(s):
        w = s.split()
        n = max(len(w) - 5, 0)
        return {" ".join(w[i : i + 5]) for i in range(n + 1)}

    # docs 1 and 2 are identical: every shingle has df >= 2 → novelty 0
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[1].n_shingles == len(sh5(a)) and got[1].n_unique == 0
    # doc 3 shares nothing → novelty 1
    assert got[3].novelty == 1.0 and got[3].n_unique == got[3].n_shingles
    # doc 4: replay exactly — shingles fully inside the `a` prefix ALSO
    # appear in docs 1/2, everything else is unique to doc 4
    shared = sh5(a) & sh5(half)
    exp_unique = len(sh5(half)) - len(shared)
    assert got[4].n_shingles == len(sh5(half))
    assert got[4].n_unique == exp_unique
    assert got[4].novelty == math.floor(exp_unique / len(sh5(half)) * 1e6) / 1e6


def test_text_zipf_planted_power_law(spark, tmp_path):
    """A corpus built with exact freq(rank) = round(1000 * rank^-1) token
    counts fits slope ≈ -1 with near-perfect R²; the stats replay an
    exact python recompute of the same ln/OLS path."""
    import math
    import os

    import pandas as pd

    freqs = {f"tok{r:03d}": max(int(round(1000 / r)), 1) for r in range(1, 51)}
    words = []
    for t, n in freqs.items():
        words.extend([t] * n)
    # spread the tokens over a few documents
    docs, chunk = [], 400
    for i in range(0, len(words), chunk):
        docs.append((i // chunk, " ".join(words[i : i + chunk])))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import text as tx

    r = tx.text_zipf(spark, d).collect()[0]
    assert r.n_terms == 50 and r.vocab_size == 50
    assert r.n_tokens == sum(freqs.values())

    ranked = sorted(freqs.values(), reverse=True)
    k = len(ranked)
    lx = [math.log(i + 1) for i in range(k)]
    ly = [math.log(n) for n in ranked]
    sx = sy = sxx = syy = sxy = 0.0
    for x, y in zip(lx, ly):
        sx, sy = sx + x, sy + y
        sxx, syy, sxy = sxx + x * x, syy + y * y, sxy + x * y
    cov = sxy / k - (sx / k) * (sy / k)
    vx = sxx / k - (sx / k) ** 2
    vy = syy / k - (sy / k) ** 2
    slope = cov / vx
    r2 = (cov / (math.sqrt(vx) * math.sqrt(vy))) ** 2
    assert r.zipf_slope == math.floor(slope * 1e6) / 1e6
    assert r.fit_r2 == math.floor(r2 * 1e6) / 1e6
    assert -1.05 < r.zipf_slope < -0.95 and r.fit_r2 > 0.99
    assert r.top1_share == math.floor(1000 / r.n_tokens * 1e6) / 1e6


def test_text_diversity_hand_corpus(spark, tmp_path):
    """Hand corpus: all-unique words → TTR = hapax = 1, Yule K = 0; a
    single word repeated n times → TTR = 1/n, hapax 0, K = 10⁴(n²−n)/n²;
    a mixed doc replays the exact spectrum arithmetic."""
    import math
    import os

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "spam spam spam spam spam",
                "a a a b b c",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [22, 24, 11],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r for r in tx.text_diversity(spark, d).collect()}
    r1 = got[1]
    assert (r1.n_tokens, r1.n_types, r1.n_hapax) == (4, 4, 4)
    assert r1.ttr == 1.0 and r1.hapax_share == 1.0 and r1.yule_k == 0.0
    r2 = got[2]
    assert (r2.n_tokens, r2.n_types, r2.n_hapax) == (5, 1, 0)
    assert r2.ttr == math.floor(1 / 5 * 1e6) / 1e6 and r2.hapax_share == 0.0
    assert r2.yule_k == math.floor(1e4 * (25.0 - 5.0) / 25.0 * 1e6) / 1e6
    r3 = got[3]
    assert (r3.n_tokens, r3.n_types, r3.n_hapax) == (6, 3, 1)
    sum_v2 = 9 + 4 + 1
    assert r3.yule_k == math.floor(1e4 * (sum_v2 - 6.0) / 36.0 * 1e6) / 1e6


def test_text_code_detect_planted(spark, tmp_path):
    """A symbol-dense snippet routes to code, plain prose to prose, and a
    snake_case-heavy doc trips the identifier rule; counts replay re."""
    import os
    import re

    import pandas as pd

    code = "def foo(a, b):\n    x = a[0] + b[1];\n    return {x: (a, b)};"
    prose = "The quick brown fox jumps over the lazy dog and naps in the sun."
    snakey = "the model_name and run_id map to data_dir plus log_path here"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [code, prose, snakey],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(code), len(prose), len(snakey)],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import text as tx

    out = {r.doc_id: r for r in tx.text_code_detect(spark, d).collect()}
    assert out[1].verdict == "code"
    assert out[2].verdict == "prose"
    assert out[3].verdict == "code" and out[3].n_ident_hits >= 4

    n_sym = len(re.findall(r"[{}()\[\];=<>]", code))
    assert out[1].n_symbols == n_sym
    assert out[2].n_ident_hits == 0


def test_dedup_winnowing_planted_copy(spark, tmp_path):
    """A doc and its suffix-appended copy share nearly all winnowed
    fingerprints (overlap ≥ τ); two unrelated docs share none. Replays the
    exact window-min selection in python."""
    import math
    import os

    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    other = "completely different words about completely different topics here " * 3
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [base, other],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(base), len(other)],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import dedup as dd

    # doc_corpus plants: +100000 near-copy of doc_id % 10 == 0 (none here),
    # +200000 exact copy of doc_id % 7 == 0 (none) — so pairs come only
    # from the two planted docs, which should NOT pair.
    out = dd.dedup_winnowing(spark, d).collect()
    assert out == []

    # ids divisible by 10 get a near-copy planted by doc_corpus
    docs2 = docs.copy()
    docs2["doc_id"] = [10, 3]
    d2 = str(tmp_path / "sf2")
    os.makedirs(d2)
    docs2.to_parquet(os.path.join(d2, "documents.parquet"))
    out2 = dd.dedup_winnowing(spark, d2).collect()
    assert len(out2) == 1
    r = out2[0]
    assert (r.doc_a, r.doc_b) == (10, 100010)
    assert r.overlap >= 0.6

    # python replay of the fingerprint sets
    import hashlib

    def fps(text):
        w = text.split()
        g = []
        for i in range(len(w) - 2):
            s = " ".join(w[i : i + 3])
            g.append(int(hashlib.md5(s.encode()).hexdigest()[:6], 16))
        return g, {min(g[j : j + 4]) for j in range(len(g) - 3)}

    g1, f1 = fps(base)
    _, f2 = fps(base + " qq zz yy xx")
    shared = len(f1 & f2)
    assert r.n_shared == shared
    assert r.overlap == math.floor(shared / min(len(f1), len(f2)) * 1e6) / 1e6
