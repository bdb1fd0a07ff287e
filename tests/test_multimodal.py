"""Multimodal plumbing tests (SURVEY §2d): binary payload synthesis, typed
metadata, mapInPandas decode/feature-extract, frame sampling, stubbed real
decoders."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from timedb_spark.io.tables import load_table
from timedb_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return mm.attach_payload(load_table(spark, sf_dir, "documents").limit(40)).cache()


def expected_payload(doc_id: int) -> bytes:
    w = 8 + doc_id % 9
    h = 8 + (doc_id // 3) % 7
    n = w * h * 3
    stream = hashlib.md5(str(doc_id).encode()).hexdigest()
    body = (stream * (n // 32 + 1))[:n]
    return mm.MAGIC.encode() + body.encode()


def test_payload_is_binary_and_deterministic(docs):
    row = docs.filter(F.col("doc_id") == 5).select("payload", "width", "height").collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert bytes(row.payload) == expected_payload(5)
    assert len(row.payload) == 8 + row.width * row.height * 3


def test_metadata_typed_columns(docs):
    sch = dict((f.name, f.dataType.simpleString()) for f in docs.schema.fields)
    assert sch["payload"] == "binary"
    assert sch["width"] == "int" and sch["height"] == "int"
    assert sch["fmt"] == "string" and sch["channels"] == "int"


def test_decode_features_matches_local_numpy(docs):
    import numpy as np

    out = {r.doc_id: r for r in mm.decode_features(docs).collect()}
    assert len(out) == 40
    for doc_id in (0, 5, 17):
        px = np.frombuffer(expected_payload(doc_id)[8:], dtype=np.uint8).astype(float)
        r = out[doc_id]
        assert r.mean_px == pytest.approx(px.mean())
        assert r.std_px == pytest.approx(px.std())
        assert len(r.thumb) == 4
        assert r.thumb[0] == pytest.approx(np.array_split(px, 4)[0].mean())
        assert r.n_bytes == 8 + r.width * r.height * 3


def test_decode_partition_invariant(docs):
    """mapInPandas is row-local: results identical under any partitioning."""
    a = sorted((r.doc_id, round(r.mean_px, 9)) for r in mm.decode_features(docs).collect())
    b = sorted((r.doc_id, round(r.mean_px, 9)) for r in mm.decode_features(docs.repartition(7)).collect())
    assert a == b


def test_unsupported_format_is_loud_stub(spark, docs):
    bad = docs.withColumn("fmt", F.lit("jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|image/audio library"):
        mm.decode_features(bad).collect()


def test_frame_sample_slices_payload(docs):
    sampled = mm.frame_sample(docs, every=3)
    r = sampled.filter((F.col("doc_id") == 5) & (F.col("frame_idx") == 3)).collect()[0]
    w = 8 + 5 % 9
    frame_len = w * 3
    exp = expected_payload(5)[8 + 3 * frame_len : 8 + 4 * frame_len]
    assert bytes(r.frame) == exp
    # every-th frame only
    idxs = [x.frame_idx for x in sampled.filter(F.col("doc_id") == 5).collect()]
    h = 8 + (5 // 3) % 7
    assert idxs == list(range(0, h, 3))


def test_multimodal_meta_counts(spark, sf_dir):
    row = mm.multimodal_meta(spark, sf_dir).collect()[0]
    assert row.fmt == "fakeimg"
    assert row.n_docs == load_table(spark, sf_dir, "documents").count()
    assert row.total_bytes == row.total_pixels + 8 * row.n_docs
