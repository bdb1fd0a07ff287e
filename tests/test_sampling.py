"""Tests for deterministic sampling / splits / sharding / packing and
connected-components dedup clustering."""

from pyspark.sql import functions as F

from timedb_spark.io.tables import load_table
from timedb_spark.operators import dedup, sampling


def test_train_split_covers_every_doc_and_is_deterministic(spark, sf_dir):
    out = sampling.train_split(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    again = {(r.doc_id, r.split) for r in sampling.train_split(spark, sf_dir).collect()}
    assert {(r.doc_id, r.split) for r in rows} == again
    # rough proportions: train should dominate (12/16 expected)
    n_train = sum(1 for r in rows if r.split == "train")
    assert n_train > n_docs * 0.6


def test_sample_stratified_subset_and_fraction(spark, sf_dir):
    total = load_table(spark, sf_dir, "documents").count()
    sampled = sampling.sample_stratified(spark, sf_dir).agg(F.sum("n_sampled")).collect()[0][0]
    # 4/16 hex buckets ≈ 25%, generous tolerance at small n
    assert 0.10 * total < sampled < 0.45 * total


def test_shard_assign_partitions_all_docs(spark, sf_dir):
    total = load_table(spark, sf_dir, "documents").count()
    shards = sampling.shard_assign(spark, sf_dir).collect()
    assert sum(r.n_docs for r in shards) == total
    assert all(0 <= r.shard < sampling.N_SHARDS for r in shards)


def test_pack_documents_invariants(spark, sf_dir):
    budget = sampling.PACK_BUDGET_TOKENS
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    n_docs = docs.count()
    packs = sampling.pack_documents(spark, sf_dir).collect()
    # every doc lands in exactly one pack
    assert sum(r.n_docs for r in packs) == n_docs
    # token totals conserved
    assert sum(r.total_tokens for r in packs) == docs.agg(F.sum("n_tokens")).collect()[0][0]
    # no pack exceeds the budget unless it is a single oversized doc
    for r in packs:
        assert r.total_tokens <= budget or r.n_docs == 1
    # deterministic across invocations
    again = sorted((r.source, r.pack_id, r.n_docs, r.total_tokens) for r in sampling.pack_documents(spark, sf_dir).collect())
    assert sorted((r.source, r.pack_id, r.n_docs, r.total_tokens) for r in packs) == again


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    pairs = dedup.dedup_minhash(spark, sf_dir).select("doc_a", "doc_b").collect()
    clusters = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, sf_dir).collect()}
    # every paired doc is labelled, pair endpoints share a cluster
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    # cluster_id is the component minimum → a member equal to its label exists
    for cid in set(clusters.values()):
        members = [d for d, c in clusters.items() if c == cid]
        assert min(members) == cid


def test_tfidf_ranks_rare_terms_first(spark, tmp_path):
    """A term unique to one doc outranks corpus-wide terms there; ranking is
    (score desc, term asc) deterministic."""
    import os

    import pandas as pd

    from timedb_spark.operators.text import text_tfidf

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["zebra common common", "common other", "common other"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [19, 12, 12],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    out = text_tfidf(spark, d).collect()
    top = {r.doc_id: r.term for r in out if r.rank == 1}
    # doc 1: zebra df=1 score=1*3e6; common tf=2 df=3 score=2e6 → zebra wins
    assert top[1] == "zebra"
    # docs 2/3: other (df=2, 1.5e6) beats common (df=3, 1e6)
    assert top[2] == "other" and top[3] == "other"
    d1 = {r.term: (r.tf, r.df, r.score) for r in out if r.doc_id == 1}
    assert d1["zebra"] == (1, 1, 3_000_000)
    assert d1["common"] == (2, 3, 2_000_000)


def test_sample_mix_thins_dominant_language(spark, sf_dir):
    from timedb_spark.io.tables import load_table
    from timedb_spark.operators.sampling import MIX_SIXTEENTHS, sample_mix

    before = {r.lang: r.n for r in load_table(spark, sf_dir, "documents").groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    after = {r.lang: r.n for r in sample_mix(spark, sf_dir).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n_before in before.items():
        rate = MIX_SIXTEENTHS.get(lang, 16)
        if rate == 16:
            assert after[lang] == n_before  # kept whole
        else:
            # md5-nibble thinning: within binomial slack of the target rate
            assert abs(after[lang] - n_before * rate / 16) <= 4 * (n_before ** 0.5)


def test_pack_documents_giant_source_bounded_groups(spark, tmp_path):
    """A single dominant source (the norm in web corpora) must split across
    many bounded first-level groups — never one giant pandas frame — while
    preserving the packing invariants."""
    import pandas as pd

    n = 5000
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": ["megacrawl"] * (n - 10) + ["tiny"] * 10,
            "text": ["tok " * (5 + i % 40) for i in range(n)],
        }
    )
    d = tmp_path / "sf_giant"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))

    budget, bucket_docs = 64, 100
    out = sampling.pack_documents(spark, str(d), budget=budget, bucket_docs=bucket_docs).collect()

    # conservation: every doc in exactly one pack, tokens conserved
    assert sum(r.n_docs for r in out) == n
    assert sum(r.total_tokens for r in out) == sum(5 + i % 40 for i in range(n))
    # budget respected (oversized single docs exempt — none planted here)
    assert all(r.total_tokens <= budget for r in out)
    # the giant source actually spans many first-level buckets: pack ids are
    # bucket-major (bucket * bucket_docs + local), so distinct buckets appear
    mega_buckets = {r.pack_id // bucket_docs for r in out if r.source == "megacrawl"}
    assert len(mega_buckets) >= (n - 10) // bucket_docs
    # deterministic across invocations
    again = sorted(
        (r.source, r.pack_id, r.n_docs, r.total_tokens)
        for r in sampling.pack_documents(spark, str(d), budget=budget, bucket_docs=bucket_docs).collect()
    )
    assert sorted((r.source, r.pack_id, r.n_docs, r.total_tokens) for r in out) == again


def test_dedup_containment_fragment_in_container(spark, tmp_path):
    """A 12-token fragment pasted verbatim into a 60-token container:
    every fragment shingle is in the container, so C(frag→cont) = 1.0
    while Jaccard stays far below the pair threshold; the reverse
    direction scores low and is not emitted."""
    import os

    import pandas as pd

    frag = " ".join(f"f{i}" for i in range(12))
    filler = " ".join(f"c{i}" for i in range(48))
    rows = [
        (1, frag, "en", "s", 0),
        (2, filler + " " + frag, "en", "s", 0),
        (3, " ".join(f"z{i}" for i in range(30)), "en", "s", 0),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = dedup.dedup_containment(spark, str(tmp_path)).collect()
    pairs = {(r.fragment, r.container): r.containment for r in out}
    assert pairs.get((1, 2)) == 1.0
    assert (2, 1) not in pairs  # container is not contained in the fragment
    assert all(f != 3 and c != 3 for f, c in pairs)  # unrelated doc untouched


def test_sample_temperature_rebalances_toward_tail(spark, tmp_path):
    """α=0.3 temperature sampling on a planted 90/9/1 corpus: shares
    replay python exactly (same exp/ln path), the dominant language is
    down-weighted (doc_weight < 1), the tail language up-weighted
    (doc_weight > 1), and q is a proper distribution."""
    import math
    import os

    import pandas as pd

    rows = []
    did = 0
    for lang, n in [("en", 900), ("de", 90), ("sw", 10)]:
        for _ in range(n):
            rows.append((did, f"text {did}", lang, "s", 10))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import sampling

    got = {r.lang: r for r in sampling.sample_temperature(spark, d).collect()}
    assert set(got) == {"en", "de", "sw"}

    n_total = 1000
    ps = {"en": 0.9, "de": 0.09, "sw": 0.01}
    pas = {l: math.exp(0.3 * math.log(p)) for l, p in ps.items()}
    z = 0.0
    for l in sorted(pas):  # pinned lang order, as the operator folds
        z = z + pas[l]
    for l, p in ps.items():
        q = pas[l] / z
        r = got[l]
        assert r.p_share == math.floor(p * 1e6) / 1e6
        assert r.q_share == math.floor(q * 1e6) / 1e6
        assert r.doc_weight == math.floor(q / p * 1e6) / 1e6
        assert r.expected_docs == math.floor(q * n_total * 1e6) / 1e6
    assert got["en"].doc_weight < 1.0 < got["sw"].doc_weight
    assert abs(sum(r.q_share for r in got.values()) - 1.0) < 1e-5


def test_sample_kcenter_planted_geometry(spark, tmp_path):
    """Orthogonal axes get picked before duplicates and midpoints, in
    farthest-first order with the min-id tiebreak; n < k yields n rows."""
    import math
    import os

    from timedb_spark.operators import sampling as sp

    e = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    mid = [0.7071067811865476 if j in (0, 1) else 0.0 for j in range(64)]
    rows = [(0, e(0), 0), (1, e(0), 0), (2, e(1), 0), (3, e(2), 0), (4, mid, 0)]
    rows = [(vid, [float(x) for x in v], lab) for vid, v, lab in rows]
    d = str(tmp_path / "kc")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    out = sp.sample_kcenter(spark, d).collect()
    assert [r.vec_id for r in out] == [0, 2, 3, 4, 1]
    assert [r.pick_rank for r in out] == [1, 2, 3, 4, 5]
    assert out[0].min_dist is None
    assert out[1].min_dist == 1.0 and out[2].min_dist == 1.0  # orthogonal picks
    # midpoint's distance replays the quantized-integer cosine exactly
    import numpy as np

    q = lambda v: np.round(np.array(np.array(v, dtype=np.float32), dtype=np.float64) * 1e6)
    qm, q0 = q(mid), q(e(0))
    cos = float(qm @ q0) / (math.sqrt(float(qm @ qm)) * math.sqrt(float(q0 @ q0)))
    assert out[3].min_dist == math.floor((1.0 - cos) * 1e6) / 1e6
    assert out[4].min_dist == 0.0  # the duplicate comes last


def test_train_split_temporal_boundaries(spark, tmp_path):
    """n = 10 → exactly 2 test rows; the boundary timestamp is the 9th
    observation; a 23-row series gets ceil(23/5) = 5 test rows."""
    import os
    from datetime import datetime, timedelta

    import pandas as pd

    from timedb_spark.operators import sampling as sp

    rows, eid = [], 0
    t0 = datetime(2024, 1, 1)
    for t in range(10):
        eid += 1
        rows.append((eid, t0 + timedelta(hours=t), 1, "x", 1.0))
    for t in range(23):
        eid += 1
        rows.append((eid, t0 + timedelta(hours=t), 2, "x", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {r.user_id: r for r in sp.train_split_temporal(spark, d).collect()}
    r1 = out[1]
    assert (r1.n_obs, r1.n_train, r1.n_test) == (10, 8, 2)
    assert r1.test_start_ts == t0 + timedelta(hours=8)
    assert r1.last_ts == t0 + timedelta(hours=9)
    r2 = out[2]
    assert (r2.n_obs, r2.n_train, r2.n_test) == (23, 18, 5)
    assert r2.test_start_ts == t0 + timedelta(hours=18)
