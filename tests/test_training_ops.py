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
