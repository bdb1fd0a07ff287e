"""ANN operators (SURVEY §2d): contract checks on the driver testdata plus a
planted-cluster recall test.

The synthetic ``embeddings`` table is isotropic noise (same-label and
cross-label mean cosine are both ≈0), so recall-vs-bruteforce on it is
uninformative — ANY pruning strategy scores ~k/n there. The honest recall
measurement plants real cluster structure (10 tight clusters in 64-d) in a
tmp parquet with the production schema and requires the approximate paths to
recover the planted neighbours.
"""

import math
import os

import numpy as np
import pytest

from timedb_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx, truth):
    hits = sum(len(approx.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


# ---------------------------------------------------------------------------
# contracts on the driver testdata
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def truth(spark):
    return _by_query(sim.ann_bruteforce(spark, SF_DIR).collect())


def test_bruteforce_shape(spark, truth):
    # top-5 per query, no self-matches
    assert set(len(v) for v in truth.values()) == {5}
    for q, t in truth.items():
        assert q not in t


def test_ivf_topk_rank_contract(spark):
    rows = sim.ann_ivf(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


# ---------------------------------------------------------------------------
# planted-cluster recall
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """embeddings.parquet with 10 planted clusters × 50 vectors (center +
    small noise), production schema (vec_id, embedding float[], label)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for lab in range(10):
        for _ in range(50):
            v = centers[lab] + rng.normal(scale=0.05, size=64)
            rows.append((vid, [float(x) for x in v.astype(np.float32)], lab))
            vid += 1
    d = str(tmp_path_factory.mktemp("clustered"))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def clustered_truth(spark, clustered_dir):
    return _by_query(sim.ann_bruteforce(spark, clustered_dir).collect())


def test_planted_truth_is_intra_cluster(clustered_truth):
    # brute force on planted data: every true neighbour shares the query's
    # cluster (vec_id // 50) — the structure the approximate paths must keep
    for q, t in clustered_truth.items():
        assert all(n // 50 == q // 50 for n in t), (q, t)


def test_lsh_recall_on_clustered(spark, clustered_dir, clustered_truth):
    approx = _by_query(sim.ann_lsh(spark, clustered_dir).collect())
    r = _recall(approx, clustered_truth)
    assert r >= 0.8, f"LSH recall {r:.2f} below floor on clustered data"


def test_ivf_recall_on_clustered(spark, clustered_dir, clustered_truth):
    approx = _by_query(sim.ann_ivf(spark, clustered_dir).collect())
    r = _recall(approx, clustered_truth)
    assert r >= 0.8, f"IVF recall {r:.2f} below floor on clustered data"


def test_pq_recall_on_clustered(spark, clustered_dir, clustered_truth):
    # ADC over 8×16 integer codebooks: coarse, but planted clusters are far
    # apart relative to the quantization error, so recall must hold.
    approx = _by_query(sim.ann_pq(spark, clustered_dir).collect())
    r = _recall(approx, clustered_truth)
    assert r >= 0.8, f"PQ recall {r:.2f} below floor on clustered data"


def test_pq_rank_contract(spark, sf_dir):
    rows = sim.ann_pq(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)  # exact-rescored order


def test_kmeans_purity_on_clustered(spark, clustered_dir):
    # 16 deterministic k-means cells over 10 planted clusters: each cell
    # should be dominated by one label (clusters may split, not blend)
    rows = sim.embed_kmeans(spark, clustered_dir).collect()
    assert len(rows) == 500
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cluster, []).append(r.vec_id // 50)  # true label
    pure = sum(max(labels.count(l) for l in set(labels)) for labels in by_cell.values())
    assert pure / 500 >= 0.9, f"k-means purity {pure/500:.2f} below floor"


def test_dedup_semantic_drops_planted_dups(spark, sf_dir):
    """Planted near-copies (vec_id + 100000, cosine ≈ 1 with their base)
    must be dropped; their lower-id base must be kept; decisions are
    cluster-scoped and deterministic."""
    from timedb_spark.operators.similarity import dedup_semantic

    out = {r.vec_id: r for r in dedup_semantic(spark, sf_dir).collect()}
    planted = [v for v in out if v >= 100000]
    assert planted
    # the PRECISE contract: a planted copy sharing its base's cluster is
    # always dropped (cosine ≈ 1 ≥ τ, base has the lower id); a copy whose
    # shifted first component flipped its cluster assignment escapes — the
    # documented cluster-scoped recall loss of SemDeDup.
    same_cluster = [v for v in planted if out[v].cluster == out[v - 100000].cluster]
    assert same_cluster  # the common case must be exercised
    for v in same_cluster:
        assert not out[v].keep and out[v].n_dup_lower >= 1
    dropped = [v for v in planted if not out[v].keep]
    assert len(dropped) >= len(same_cluster)  # cross-cluster dups may still be caught
    again = {r.vec_id: (r.cluster, r.keep) for r in dedup_semantic(spark, sf_dir).collect()}
    assert {v: (r.cluster, r.keep) for v, r in out.items()} == again


def test_semantic_k_formula_pins_gate_and_scales(spark, sf_dir):
    """The corpus-derived K (r13, VERDICT r12 #3): the _KM_K floor must hold
    for EVERY gate-SF corpus so the fixed-K=16 oracle stays bit-identical,
    and beyond the floor K must grow ∝ n (constant target cluster size —
    the SemDeDup linear-pair-space posture, now code instead of prose)."""
    from timedb_spark.operators.dedup import emb_corpus
    from timedb_spark.operators.similarity import _KM_K, _SEM_TARGET_CLUSTER, _semantic_k

    # gate invariance: the real gate corpora sit under the floor boundary
    n_gate = emb_corpus(spark, sf_dir).count()
    assert n_gate < _KM_K * _SEM_TARGET_CLUSTER
    assert _semantic_k(n_gate) == _KM_K
    # the largest gate corpus (sf0.1 = 2200) also stays pinned
    assert _semantic_k(2200) == _KM_K
    assert _semantic_k(_KM_K * _SEM_TARGET_CLUSTER - 1) == _KM_K
    # beyond the floor: K grows with n at constant target cluster size
    assert _semantic_k(_KM_K * _SEM_TARGET_CLUSTER) == _KM_K
    assert _semantic_k(44000) == 44000 // _SEM_TARGET_CLUSTER == 171
    for n in (10_000, 100_000, 1_000_000):
        k = _semantic_k(n)
        assert abs(n / k - _SEM_TARGET_CLUSTER) <= _SEM_TARGET_CLUSTER  # |cluster| bounded
        assert _semantic_k(2 * n) >= k  # monotone


# ---------------------------------------------------------------------------
# hybrid retrieval + int8 quantization (r5 additions)
# ---------------------------------------------------------------------------


def test_hybrid_matches_numpy_recompute(spark):
    """ann_hybrid's fused score equals a local recompute: cosine on the
    round(x*1e6) ints + Jaccard on distinct whitespace tokens, 0.5/0.5."""
    got = {(r.query_id, r.neighbor_id): r.score for r in sim.ann_hybrid(spark, SF_DIR).collect()}
    emb = {r.vec_id: np.array([round(x * 1e6) for x in r.embedding]) for r in
           sim.load_table(spark, SF_DIR, "embeddings").collect()}
    toks = {r.doc_id: set(r.text.strip().split()) for r in
            sim.load_table(spark, SF_DIR, "documents").collect()}
    for (q, n), s in got.items():
        c = float(emb[q] @ emb[n]) / (math.sqrt(float(emb[q] @ emb[q])) * math.sqrt(float(emb[n] @ emb[n])))
        j = len(toks[q] & toks[n]) / len(toks[q] | toks[n])
        assert abs(s - (0.5 * c + 0.5 * j)) < 1e-5, (q, n)
    # every query present with exactly top-k rows
    per_q = {}
    for (q, _n) in got:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {sim._TOP_K} and len(per_q) == sim._N_QUERIES


def test_hybrid_beats_each_leg_on_its_blind_spot(spark):
    """Sanity of the fusion: the hybrid ranking is NOT identical to the pure
    dense ranking (the lexical leg moves at least one neighbour in or out) —
    if it were, the fusion would be dead weight."""
    dense = _by_query(sim.ann_bruteforce(spark, SF_DIR).collect())
    hybrid = _by_query(sim.ann_hybrid(spark, SF_DIR).collect())
    assert any(dense[q] != hybrid.get(q) for q in dense)


def test_embed_quantize_roundtrip_error_bound(spark):
    """int8 codes reconstruct within the half-step bound: every code is in
    [-127, 127], |x*127 - code*amax| <= amax/2 per component (exact
    half-away rounding), and sq_err equals the numpy recompute."""
    rows = sim.embed_quantize(spark, SF_DIR).collect()
    emb = {r.vec_id: np.array([round(x * 1e6) for x in r.embedding], dtype=np.int64) for r in
           sim.load_table(spark, SF_DIR, "embeddings").collect()}
    assert len(rows) == len(emb)
    for r in rows:
        q = emb[r.vec_id]
        amax = max(int(np.abs(q).max()), 1)
        assert r.amax == amax
        codes = np.array(r.codes, dtype=np.int64)
        assert codes.min() >= -127 and codes.max() <= 127
        resid = q * 127 - codes * amax
        assert int(np.abs(resid).max()) <= amax // 2 + 1  # half-step bound
        assert r.sq_err == int((resid * resid).sum())


def test_ann_mmr_matches_python_replay(spark):
    """The one-fold MMR selection equals an exact python replay of the
    greedy definition (same quantized cosines, same keep-first tie-break),
    and every ranked list is strictly diversity-ordered: each pick's
    mmr_score is non-increasing and rank 1 is the raw top relevance."""
    import math

    import pandas as pd

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    Q = {
        int(v): np.array([round(float(x) * 1e6) for x in e], dtype=np.int64)
        for v, e in zip(emb.vec_id, emb.embedding)
    }

    def cos(a, b):
        qa, qb = Q[a], Q[b]
        return float(int((qa * qb).sum())) / (
            math.sqrt(float(int((qa * qa).sum()))) * math.sqrt(float(int((qb * qb).sum())))
        )

    got = sim.ann_mmr(spark, SF_DIR).toPandas()
    assert len(got) == sim._N_QUERIES * sim._MMR_K
    for qid in range(sim._N_QUERIES):
        rels = sorted(((v, cos(qid, v)) for v in Q if v != qid), key=lambda t: (-t[1], t[0]))
        cands = rels[: sim._MMR_CANDS]
        sel: list[tuple[int, int, float]] = []
        lam = sim._MMR_LAMBDA
        for _ in range(sim._MMR_K):
            best = (-1e18, -1)
            for i, (v, rel) in enumerate(cands):
                if i in [s[0] for s in sel]:
                    continue
                ms = max([cos(v, s[1]) for s in sel], default=0.0)
                ms = max(ms, 0.0)
                sc = lam * rel - (1 - lam) * ms
                if sc > best[0]:
                    best = (sc, i)
            sel.append((best[1], cands[best[1]][0], best[0]))
        g = got[got.query_id == qid].sort_values("mmr_rank")
        assert list(g.neighbor_id) == [s[1] for s in sel], qid
        assert list(g.mmr_score) == [math.floor(s[2] * 1e6) / 1e6 for s in sel], qid
        assert g.iloc[0].neighbor_id == cands[0][0]  # rank 1 = raw top rel
        assert all(np.diff(g.mmr_score) <= 1e-12)


def test_ann_recall_consistent_with_member_outputs(spark):
    """ann_recall's per-(method, query) hit counts equal a pandas
    recomputation of |approx ∩ exact| from the member operators' own
    outputs, with recall = hits/k for every one of the 3 x N_QUERIES
    rows."""
    got = sim.ann_recall(spark, SF_DIR).toPandas()
    assert len(got) == 3 * sim._N_QUERIES
    exact = sim.ann_bruteforce(spark, SF_DIR).toPandas()
    ex = exact.groupby("query_id").neighbor_id.apply(set).to_dict()
    for method, fn in (("lsh", sim.ann_lsh), ("ivf", sim.ann_ivf), ("pq", sim.ann_pq)):
        ap = fn(spark, SF_DIR).toPandas().groupby("query_id").neighbor_id.apply(set).to_dict()
        for qid, exact_set in ex.items():
            hits = len(exact_set & ap.get(qid, set()))
            row = got[(got.method == method) & (got.query_id == qid)]
            assert len(row) == 1
            assert row.iloc[0].n_hits == hits, (method, qid)
            assert row.iloc[0].recall == hits / len(exact_set)


# ---------------------------------------------------------------------------
# centroid-margin outlier / mislabel detection
# ---------------------------------------------------------------------------


def test_embed_outliers_flags_planted_mislabels(spark, clustered_dir):
    """On the planted 10×50 clusters, every vector scores closest to its
    own label's centroid — except vectors we deliberately mislabel, which
    must surface with is_mislabeled=True, a negative margin, and
    best_other = their true cluster."""
    import pandas as pd

    # corrupt 5 labels in a copy of the clustered fixture
    src = pd.read_parquet(os.path.join(clustered_dir, "embeddings.parquet"))
    bad = {3, 107, 251, 404, 499}  # true labels 0,2,5,8,9
    src["label"] = [
        (int(l) + 1) % 10 if vid in bad else int(l)
        for vid, l in zip(src["vec_id"], src["label"])
    ]
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(src).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )

    got = {r.vec_id: r for r in sim.embed_outliers(spark, d).collect()}
    assert len(got) == 500

    for vid in bad:
        r = got[vid]
        assert r.is_mislabeled, vid
        assert r.margin < 0
        assert r.best_other == vid // 50  # the true planted cluster

    clean = [r for vid, r in got.items() if vid not in bad]
    n_false = sum(1 for r in clean if r.is_mislabeled)
    assert n_false == 0  # tight planted clusters: no false positives
    assert all(r.margin > 0 for r in clean)
    # margins are consistent: cos_own - cos_other, rounded like the gate
    for r in list(got.values())[:20]:
        assert abs(r.margin - round(r.cos_own - r.cos_other, 4)) < 2e-4


def test_embed_isotropy_hand_computed(spark, tmp_path):
    """Three 2-d vectors with equal per-dim variance: PR = 2 (pr_frac 1),
    rms/center replay the exact quantized-integer derivation."""
    import math
    import os

    import pandas as pd

    from timedb_spark.operators import similarity

    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    pdf = pd.DataFrame(
        {"vec_id": [0, 1, 2], "label": ["a", "a", "b"], "embedding": vecs}
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "embeddings.parquet"))

    r = similarity.embed_isotropy(spark, d).collect()[0]
    assert (r.n_vecs, r.dim) == (3, 2)

    q = [[round(x * 1e6) for x in v] for v in vecs]
    n = 3.0
    sx = [sum(v[j] for v in q) for j in (0, 1)]
    sxx = [sum(v[j] * v[j] for v in q) for j in (0, 1)]
    var = [sxx[j] / n - (sx[j] / n) * (sx[j] / n) for j in (0, 1)]
    mean_sq = [(sx[j] / n) * (sx[j] / n) for j in (0, 1)]
    sum_var = 0.0
    sum_var2 = 0.0
    center = 0.0
    for j in (0, 1):  # dim order = pinned fold order
        sum_var += var[j]
        sum_var2 += var[j] * var[j]
        center += mean_sq[j]
    mean_norm_sq = sum(sxx) / n / 1e12
    pr = sum_var * sum_var / sum_var2
    assert r.participation_ratio == math.floor(pr * 1e6) / 1e6
    assert r.pr_frac == math.floor(pr / 2.0 * 1e6) / 1e6 == 1.0  # PR = d on equal vars
    assert r.rms_norm == math.floor(math.sqrt(mean_norm_sq) * 1e6) / 1e6
    assert r.center_norm_frac == math.floor(center / 1e12 / mean_norm_sq * 1e6) / 1e6


def test_embed_cluster_purity_consistent_with_kmeans(spark, sf_dir):
    """Purity rows must replay a python recount over the ACTUAL kmeans
    assignment joined to the real labels (majority by count desc, label
    asc; shares floor-scaled)."""
    import math

    import pandas as pd

    from timedb_spark.operators import similarity

    assign = {r.vec_id: r.cluster for r in similarity.embed_kmeans(spark, sf_dir).collect()}
    labels = dict(
        pd.read_parquet(f"{sf_dir}/embeddings.parquet")[["vec_id", "label"]].values
    )
    counts: dict = {}
    for vid, cell in assign.items():
        counts.setdefault(cell, {}).setdefault(labels[vid], 0)
        counts[cell][labels[vid]] += 1

    got = {r.cluster: r for r in similarity.embed_cluster_purity(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for cell, by_label in counts.items():
        r = got[cell]
        n = sum(by_label.values())
        top_label, top_n = sorted(by_label.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r.n_vecs, r.n_labels) == (n, len(by_label))
        assert (r.top_label, r.top_n) == (top_label, top_n)
        assert r.purity == math.floor(top_n / n * 1e6) / 1e6


def test_ann_filtered_label_scope(spark, clustered_dir):
    """Every neighbour carries the query's own label, and the top-k equals
    an exact numpy replay of label-restricted cosine ranking."""
    rows = sim.ann_filtered(spark, clustered_dir).collect()
    # fixture: vec_id // 50 == label, 10 queries (vec_id < 10) all label 0
    by_q = {}
    for r in rows:
        assert r.label == 0 and 0 <= r.neighbor_id < 50
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))

    import pandas as pd

    pdf = pd.read_parquet(os.path.join(clustered_dir, "embeddings.parquet"))
    q = np.array([np.round(np.array(v, dtype=np.float64) * 1e6) for v in pdf.embedding], dtype=np.int64)
    labels = pdf.label.to_numpy()
    ids = pdf.vec_id.to_numpy()
    for qid in range(10):
        qi = np.where(ids == qid)[0][0]
        mask = (labels == labels[qi]) & (ids != qid)
        cand = np.where(mask)[0]
        cos = (q[cand] @ q[qi]) / (
            np.sqrt((q[cand] * q[cand]).sum(axis=1)) * np.sqrt(float(q[qi] @ q[qi]))
        )
        order = sorted(zip(-cos, ids[cand]))[:5]
        expect = [int(i) for _, i in order]
        got = [r.neighbor_id for r in sorted(by_q[qid], key=lambda r: r.rank)]
        assert got == expect


def test_embed_centroid_drift_planted(spark, tmp_path):
    """A label whose halves share a direction is stable (cos ≈ 1, ratio 1);
    a label whose odd half rotates to an orthogonal direction is drifted."""
    rows = []
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    for vid in range(20):  # label 0: identical direction both halves
        rows.append((vid, e1, 0))
    for vid in range(20, 40):  # label 1: even → e1, odd → e2 (orthogonal)
        rows.append((vid, e1 if vid % 2 == 0 else e2, 1))
    d = str(tmp_path / "drift")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    out = {r.label: r for r in sim.embed_centroid_drift(spark, d).collect()}
    assert out[0].verdict == "stable" and out[0].centroid_cosine == 1.0
    assert out[0].norm_ratio == 1.0 and out[0].n_old == out[0].n_new == 10
    assert out[1].verdict == "drifted" and out[1].centroid_cosine == 0.0
    assert out[1].drift == 1.0


def test_embed_knn_graph_clustered(spark, clustered_dir):
    """On the planted clusters every vector gets exactly 3 ranked
    neighbors, cluster-mates dominate, and mutuality is symmetric:
    edge (a→b) is mutual iff (b→a) exists in the edge set."""
    rows = sim.embed_knn_graph(spark, clustered_dir).collect()
    by_src = {}
    edges = set()
    for r in rows:
        by_src.setdefault(r.vec_id, []).append(r)
        edges.add((r.vec_id, r.neighbor_id))
    # ranks are contiguous from 1; vectors in cells smaller than k+1
    # correctly get fewer edges
    assert all(sorted(x.rank for x in v) == list(range(1, len(v) + 1)) for v in by_src.values())
    assert max(len(v) for v in by_src.values()) == 3
    # same planted cluster (vec_id // 50) for the top neighbor, tight clusters
    same = sum(1 for r in rows if r.rank == 1 and r.neighbor_id // 50 == r.vec_id // 50)
    assert same / len(by_src) > 0.95
    for r in rows:
        assert r.mutual == (1 if (r.neighbor_id, r.vec_id) in edges else 0)
