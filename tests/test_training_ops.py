"""Unit tests for the round-3 training-pipeline additions:

- text_boilerplate — corpus-frequency shingle flagging (crafted corpus with
  a planted template: template shingles flagged, unique prose not)
- text_vocab — rank ordering + cumulative-share contract on a hand corpus
- events_rfm — quintile scores on a hand-built purchase history
- ann_range — radius semantics vs a brute-force recompute (every returned
  pair >= tau, every >= tau pair returned)
- embed_pca — projection matches a numpy full recompute (mean-centred,
  sign-fixed eigh) within float tolerance
"""

import numpy as np
import pandas as pd
import pytest

from timedb_spark.operators import analytics, similarity, text

SF = "/root/testdata/sf0.001"


def _docs_dir(tmp_path, rows):
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    return str(tmp_path)


def test_boilerplate_flags_planted_template(spark, tmp_path):
    template = "all rights reserved contact us here"
    rows = [(i, f"unique prose number {i} " + template, "en", "s", 0) for i in range(6)]
    rows.append((99, "totally original text with no repeats at all whatsoever", "en", "s", 0))
    out = {r["doc_id"]: r for r in text.text_boilerplate(spark, _docs_dir(tmp_path, rows)).collect()}
    # the template contributes shingles shared by 6 docs (>= min_docs=5)
    assert out[0]["n_boiler"] >= 4
    assert out[0]["boiler_ratio"] > 0
    # the unique doc shares nothing
    assert out[99]["n_boiler"] == 0
    assert out[99]["boiler_ratio"] == 0.0


def test_vocab_rank_and_cumulative_share(spark, tmp_path):
    rows = [(1, "a a a b b c", "en", "s", 0), (2, "a b", "en", "s", 0)]
    out = text.text_vocab(spark, _docs_dir(tmp_path, rows)).orderBy("rank").collect()
    assert [(r["token"], r["n"], r["rank"]) for r in out] == [("a", 4, 1), ("b", 3, 2), ("c", 1, 3)]
    assert out[0]["cum_share"] == pytest.approx(4 / 8)
    assert out[-1]["cum_share"] == pytest.approx(1.0)


def test_rfm_scores_hand_computed(spark, tmp_path):
    # 5 users with strictly increasing frequency/monetary and decreasing
    # recency -> user k lands in quintile k of every dimension.
    ev = []
    eid = 0
    for u in range(1, 6):
        for k in range(u):  # u purchases; last one at day 10+u (later = more recent)
            ev.append((eid, pd.Timestamp(2024, 1, 10 + u, tz="UTC"), u, "purchase", float(u), "{}"))
            eid += 1
    ev.append((eid, pd.Timestamp(2024, 1, 20, tz="UTC"), 1, "click", 0.0, "{}"))  # anchor
    pd.DataFrame(ev, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]).to_parquet(
        tmp_path / "events.parquet"
    )
    out = {r["user_id"]: r for r in analytics.events_rfm(spark, str(tmp_path)).collect()}
    assert len(out) == 5
    for u in range(1, 6):
        assert out[u]["frequency"] == u
        assert out[u]["monetary"] == pytest.approx(u * u)
        assert (out[u]["r_score"], out[u]["f_score"], out[u]["m_score"]) == (u, u, u)
        assert out[u]["segment"] == f"{u}{u}{u}"
    assert out[5]["recency_s"] == 5 * 86400  # Jan 15 purchase vs Jan 20 anchor


def test_ann_range_matches_bruteforce_filter(spark):
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.ann_range(spark, SF).collect()
    }
    emb = similarity.load_table(spark, SF, "embeddings").orderBy("vec_id").collect()
    q = np.array([[round(x * 1e6) for x in r["embedding"]] for r in emb], dtype=np.float64)
    ids = [r["vec_id"] for r in emb]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    C = qn[: similarity._N_QUERIES] @ qn.T
    want = {
        (ids[i], ids[j]): round(C[i, j], 6)
        for i in range(similarity._N_QUERIES)
        for j in range(len(ids))
        if ids[i] != ids[j] and C[i, j] >= similarity._RANGE_TAU
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_embed_pca_matches_numpy(spark):
    out = similarity.embed_pca(spark, SF).orderBy("vec_id").toPandas()
    emb = similarity.load_table(spark, SF, "embeddings").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    mean = X.mean(0)
    cov = np.cov(X, rowvar=False)
    _w, V = np.linalg.eigh(cov)
    for j in range(similarity._PCA_Q):
        v = V[:, -1 - j]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        ref = (X - mean) @ v
        assert np.allclose(out[f"pc{j + 1}"].to_numpy(), ref, atol=2e-4), f"pc{j + 1}"


# ---------------------------------------------------------------------------
# round-6 batch-2 additions: dedup_spans / text_collocations / text_chunk /
# sample_weighted
# ---------------------------------------------------------------------------


def test_dedup_spans_hand_corpus(spark, tmp_path):
    """12-token doc duplicated across two docs: every 10-token window is
    corpus-duplicated and the interval union covers the whole doc; a unique
    doc has zero dup spans; a 5-token doc is below the span width."""
    shared = " ".join(f"w{i}" for i in range(12))
    uniq = " ".join(f"u{i}" for i in range(12))
    rows = [
        (1, shared, "en", "s", 0),
        (2, shared, "en", "s", 0),
        (3, uniq, "en", "s", 0),
        (4, "a b c d e", "en", "s", 0),
    ]
    from timedb_spark.operators import dedup

    out = {r["doc_id"]: r for r in dedup.dedup_spans(spark, _docs_dir(tmp_path, rows)).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 3
    assert out[1]["dup_cov_tokens"] == 12 and out[1]["dup_frac"] == 1.0
    assert out[2]["n_dup_spans"] == 3
    assert out[3]["n_spans"] == 3 and out[3]["n_dup_spans"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["n_spans"] == 0 and out[4]["n_tokens"] == 5 and out[4]["dup_frac"] == 0.0


def test_collocations_pmi_hand_computed(spark, tmp_path):
    """Two 6-token docs of alternating 'new york': (new,york) occurs 6 times
    (>= min count 5), (york,new) only 4 (dropped). PMI checked against the
    closed form ln(c_xy*T*T / (B*c_x*c_y))."""
    import math

    rows = [
        (1, "new york new york new york", "en", "s", 0),
        (2, "new york new york new york", "en", "s", 0),
    ]
    out = text.text_collocations(spark, _docs_dir(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"]) == ("new", "york")
    assert (r["n_xy"], r["n_x"], r["n_y"]) == (6, 6, 6)
    expected = math.floor(math.log((6 * 12 * 12) / (10 * 6 * 6)) * 1e6) / 1e6
    assert r["pmi"] == expected


def test_text_chunk_boundaries(spark, tmp_path):
    """Chunk math: 100 tokens -> starts {0,48} with lengths {64,52};
    exactly-64 tokens -> one chunk; 65 -> two, the second 17 tokens; the
    final chunk always reaches the end of the doc."""
    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    rows = [(100, doc(100), "en", "s", 0), (64, doc(64), "en", "s", 0), (65, doc(65), "en", "s", 0)]
    out = text.text_chunk(spark, _docs_dir(tmp_path, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c100 = sorted(by_doc[100], key=lambda r: r["chunk_start"])
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in c100] == [(0, 64), (48, 52)]
    assert c100[1]["chunk_text"].split()[-1] == "t99"
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in by_doc[64]] == [(0, 64)]
    c65 = sorted(by_doc[65], key=lambda r: r["chunk_start"])
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in c65] == [(0, 64), (48, 17)]


def test_sample_weighted_matches_python_recompute(spark):
    """The A-ES top-k must equal an exact python recompute of
    key = ln((h48+1)/(2^48+1))/w over the real table — same md5, same
    integer hash, same IEEE division."""
    import hashlib
    import math

    from timedb_spark.operators import sampling

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]

    def key(doc_id, w):
        h = hashlib.md5(f"wsample-1{doc_id}".encode()).hexdigest()
        hv = int(h[:12], 16)
        u = (hv + 1) / float(2**48 + 1)
        return math.floor(math.log(u) / float(w) * 1e9) / 1e9

    docs["es_key"] = [key(d, w) for d, w in zip(docs.doc_id, docs.n_chars)]
    expected = docs.sort_values(["es_key", "doc_id"], ascending=[False, True]).head(
        sampling.SAMPLE_WEIGHTED_K
    )
    got = sampling.sample_weighted(spark, SF).toPandas()
    assert len(got) == sampling.SAMPLE_WEIGHTED_K
    assert list(got.doc_id) == list(expected.doc_id)
    assert list(got.es_key) == list(expected.es_key)


def test_dedup_report_consistent_with_member_operators(spark):
    import math

    """The audit's per-method numbers must replay the member operators
    exactly: n_pairs == each leg's row count, overlap(minhash leg) is the
    reflexive full set (jaccard 1.0), and doc counts match the distinct
    endpoints of each leg's pairs."""
    from timedb_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    got = {r.method: r for r in dedup.dedup_report(spark, sf).collect()}
    assert set(got) == {"minhash", "simhash", "ngram", "editdist"}

    mh_pairs = {(r.doc_a, r.doc_b) for r in dedup.dedup_minhash(spark, sf).collect()}
    assert got["minhash"].n_pairs == len(mh_pairs)
    assert got["minhash"].overlap_minhash == len(mh_pairs)
    assert got["minhash"].jaccard_vs_minhash == 1.0

    ng = {(r.doc_a, r.doc_b) for r in dedup.dedup_ngram_jaccard(spark, sf).collect()}
    assert got["ngram"].n_pairs == len(ng)
    assert got["ngram"].overlap_minhash == len(ng & mh_pairs)
    assert got["ngram"].n_docs == len({d for p in ng for d in p})
    union = len(ng) + len(mh_pairs) - len(ng & mh_pairs)
    assert got["ngram"].jaccard_vs_minhash == math.floor(len(ng & mh_pairs) / union * 1e6) / 1e6


def test_sample_dedup_aware_debiases_clusters(spark):
    """The cluster-debiased A-ES top-k must equal a python recompute with
    weight n_chars / cluster_size, where cluster sizes come from the
    ACTUAL dedup_clusters labels — duplicated docs carry proportionally
    less weight than sample_weighted gives them."""
    import hashlib
    import math

    from timedb_spark.operators import dedup, sampling

    labels = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, SF).collect()}
    sizes: dict = {}
    for cid in labels.values():
        sizes[cid] = sizes.get(cid, 0) + 1

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]

    def key(doc_id, n_chars):
        csize = sizes.get(labels.get(doc_id), 1)
        h = hashlib.md5(f"dasample-1{doc_id}".encode()).hexdigest()
        hv = int(h[:12], 16)
        u = (hv + 1) / float(2**48 + 1)
        return math.floor(math.log(u) / (float(n_chars) / float(csize)) * 1e9) / 1e9

    docs["es_key"] = [key(d, w) for d, w in zip(docs.doc_id, docs.n_chars)]
    expected = docs.sort_values(["es_key", "doc_id"], ascending=[False, True]).head(
        sampling.SAMPLE_WEIGHTED_K
    )
    got = sampling.sample_dedup_aware(spark, SF).toPandas()
    assert len(got) == sampling.SAMPLE_WEIGHTED_K
    assert list(got.doc_id) == list(expected.doc_id)
    assert list(got.es_key) == list(expected.es_key)
    # every clustered doc reports its real cluster size; singletons 1
    for did, cs in zip(got.doc_id, got.cluster_size):
        assert cs == sizes.get(labels.get(did), 1)


def test_dedup_lsh_tuning_invariants_and_minhash_consistency(spark):
    """Band-split nesting: a full (b, r) band match implies matches of all
    finer aligned splits, so candidates grow monotonically with b and the
    loosest split's recall is 1 by construction. The production split's
    verified count must equal dedup_minhash's actual output (same sigs,
    same τ)."""
    from timedb_spark.operators import dedup, sampling  # noqa: F401

    rows = {r.bands: r for r in dedup.dedup_lsh_tuning(spark, SF).collect()}
    assert sorted(rows) == [2, 4, 8, 16]
    cands = [rows[b].n_candidates for b in (2, 4, 8, 16)]
    assert cands == sorted(cands), cands  # nested candidate sets
    recalls = [rows[b].recall_vs_loosest for b in (2, 4, 8, 16) if rows[b].recall_vs_loosest is not None]
    assert recalls == sorted(recalls)
    assert rows[16].recall_vs_loosest == 1.0
    # production split (4x4) verifies exactly what dedup_minhash emits
    assert rows[4].n_verified == dedup.dedup_minhash(spark, SF).count()
    for b in (2, 4, 8, 16):
        r = rows[b]
        assert r.rows_per_band == 16 // b
        assert r.n_verified <= r.n_candidates


def test_pipeline_dataset_card_hand_corpus(spark, tmp_path):
    """A five-doc corpus with one exact duplicate pair, two languages and
    a short doc: every card stat replays the hand computation."""
    import math
    import os

    import pandas as pd

    texts = [
        ("alpha beta gamma", "en", "s1"),
        ("alpha beta gamma", "en", "s2"),      # exact duplicate
        ("uno dos", "es", "s1"),
        ("one two three four five six", "en", "s1"),
        ("x", "en", "s3"),                      # short
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(1, 6),
            "text": [t for t, _, _ in texts],
            "lang": [l for _, l, _ in texts],
            "source": [s for _, _, s in texts],
            "n_chars": [len(t) for t, _, _ in texts],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import pipeline as pl

    r = pl.pipeline_dataset_card(spark, d).collect()[0]
    assert (r.n_docs, r.n_sources, r.n_langs) == (5, 3, 2)
    assert r.total_tokens_ws == 3 + 3 + 2 + 6 + 1
    assert r.dup_rate == math.floor((1 - 4 / 5) * 1e6) / 1e6
    assert r.top_lang == "en" and r.top_lang_share == math.floor(4 / 5 * 1e6) / 1e6
    assert r.short_share == 1.0  # all docs < 200 chars
    total_chars = sum(len(t) for t, _, _ in texts)
    assert r.total_chars == total_chars
    assert r.mean_chars == math.floor(total_chars / 5 * 1e6) / 1e6


def test_contamination_semantic_planted_leak(spark, tmp_path):
    """A scan vector that is a near-copy of a benchmark vector flags
    contaminated with the right offender; orthogonal vectors stay clean."""
    import os

    e = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    near = [0.999 if j == 0 else (0.02 if j == 1 else 0.0) for j in range(64)]
    rows = [
        (0, e(0), 0),    # benchmark (0 % 11 == 0)
        (11, e(1), 0),   # benchmark, orthogonal direction
        (1, near, 0),    # scan: near-copy of bench 0 → contaminated
        (2, e(2), 0),    # scan: orthogonal → clean
    ]
    rows = [(vid, [float(x) for x in v], lab) for vid, v, lab in rows]
    d = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    from timedb_spark.operators import pipeline as pl

    out = {r.vec_id: r for r in pl.contamination_semantic(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1].verdict == "contaminated" and out[1].bench_id == 0
    assert out[1].cosine > 0.99
    assert out[2].verdict == "clean"


def test_text_instruction_detect_planted(spark, tmp_path):
    """An instruction-style doc (imperatives + list + questions) routes to
    'instruction'; descriptive prose stays 'plain'; counts replay re."""
    import os
    import re

    import pandas as pd

    instr = "Follow these steps. 1. Open the panel. 2. Select your file. Do you see it?"
    plain = "The river flows gently through the valley and the birds sing at dawn."
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [instr, plain],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [len(instr), len(plain)],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import text as tx

    out = {r.doc_id: r for r in tx.text_instruction_detect(spark, d).collect()}
    assert out[1].verdict == "instruction" and out[1].n_signal_families >= 3
    assert out[2].verdict == "plain" and out[2].n_signal_families == 0
    assert out[1].n_questions == instr.count("?")
    assert out[1].n_list_markers == len(re.findall(r"(^|\s)\d+[.)]\s", instr))
