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


# ---------------------------------------------------------------------------
# stdlib PNG codec: real decode path, no image libs
# ---------------------------------------------------------------------------


def _rand_px(seed: int, h: int, stride: int):
    import numpy as np

    # deterministic pseudo-random pixels without RNG plumbing
    return np.frombuffer(
        b"".join(hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(h * stride // 16 + 1)),
        dtype=np.uint8,
    )[: h * stride].reshape(h, stride)


@pytest.mark.parametrize("row_filter", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_all_filters(row_filter, channels):
    """encode→decode is the identity for every PNG filter type and each
    supported color type (gray/RGB/RGBA)."""
    import numpy as np

    w, h = 9, 6
    px = _rand_px(row_filter * 10 + channels, h, w * channels)
    payload = mm.encode_png(px, w, h, channels=channels, row_filter=row_filter)
    out, ow, oh, oc = mm.decode_png(payload)
    assert (ow, oh, oc) == (w, h, channels)
    assert np.array_equal(out, px)


def test_png_rejects_corruption():
    px = _rand_px(1, 4, 4 * 3)
    payload = bytearray(mm.encode_png(px, 4, 4, channels=3))
    with pytest.raises(ValueError, match="signature"):
        mm.decode_png(b"JUNK" + bytes(payload[4:]))
    payload[40] ^= 0xFF  # flip a byte inside a chunk -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(payload))


def test_png_rejects_truncation_with_valueerror():
    """A payload cut mid-chunk must raise the codec's own ValueError at any
    cut point — never leak struct.error (short CRC slice) out of the
    mapInPandas decode path."""
    px = _rand_px(2, 4, 4 * 3)
    payload = mm.encode_png(px, 4, 4, channels=3)
    for cut in (9, 20, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError, match="truncated"):
            mm.decode_png(payload[:cut])


def test_mixed_payload_png_features_equal_fakeimg(spark, sf_dir):
    """attach_payload_mixed re-encodes every 7th doc as a real PNG of the
    SAME keystream pixels — decoded features must be bit-identical to the
    fakeimg features for those docs, proving the stdlib decoder end-to-end
    inside the Spark plumbing."""
    base = load_table(spark, sf_dir, "documents").limit(30)
    plain = {r.doc_id: r for r in mm.decode_features(mm.attach_payload(base)).collect()}
    mixed = {r.doc_id: r for r in mm.decode_features(mm.attach_payload_mixed(base)).collect()}
    assert set(plain) == set(mixed)
    n_png = sum(1 for r in mixed.values() if r.fmt == "png")
    assert n_png >= 3  # every 7th of 30 docs
    for doc_id, m in mixed.items():
        p = plain[doc_id]
        assert (m.width, m.height) == (p.width, p.height)
        assert m.mean_px == p.mean_px and m.std_px == p.std_px and m.thumb == p.thumb
        if m.fmt == "png":
            assert m.n_bytes != p.n_bytes  # genuinely different wire format


# ---------------------------------------------------------------------------
# audio modality: stdlib WAV codec
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_features_match_local_recompute(spark, sf_dir):
    import numpy as np

    # codec roundtrip
    samples = mm.keystream_samples(7, 300)
    payload = mm.encode_wav(samples)
    dec, rate, nch = mm.decode_wav(payload)
    assert (rate, nch) == (8000, 1) and np.array_equal(dec, samples)

    # Spark path: features equal a local numpy recompute
    docs = load_table(spark, sf_dir, "documents").limit(25)
    out = {r.doc_id: r for r in mm.audio_features(mm.attach_audio_payload(docs)).collect()}
    assert len(out) == 25
    for doc_id in list(out)[:5]:
        r = out[doc_id]
        s = mm.keystream_samples(doc_id, 256 + doc_id % 128).astype(np.float64)
        assert r.n_samples == s.size
        assert r.duration_ms == s.size * 1000.0 / 8000
        assert abs(r.rms - float(np.sqrt((s * s).mean()))) < 1e-9
        assert r.peak == int(np.abs(s).max())
        zc = int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
        assert r.n_zero_crossings == zc


def test_wav_rejects_non_pcm16(spark):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="PCM16"):
        mm.decode_wav(buf.getvalue())


def test_phash_replays_keystream_and_banding(spark, sf_dir):
    """The 63-bit dHash replays exactly from the md5 keystream in python
    (integer cell bounds + cross-product mean compares), and the banded
    candidate stats equal a brute-force recount over all hashes."""
    import hashlib

    from timedb_spark.operators import multimodal as mm

    out = {r.doc_id: r for r in mm.multimodal_phash(spark, sf_dir).collect()}

    def replay(doc_id):
        w, h = 8 + doc_id % 9, 8 + (doc_id // 3) % 7
        n = w * h * 3
        ks = hashlib.md5(str(doc_id).encode()).hexdigest()
        body = (ks * (n // 32 + 1))[:n].encode()
        ncells = 70
        sums = [sum(body[j * n // ncells : (j + 1) * n // ncells]) for j in range(ncells)]
        lens = [(j + 1) * n // ncells - j * n // ncells for j in range(ncells)]
        ph = 0
        for r_ in range(7):
            for c_ in range(9):
                a, b = r_ * 10 + c_, r_ * 10 + c_ + 1
                if sums[a] * lens[b] > sums[b] * lens[a]:
                    ph |= 1 << (r_ * 9 + c_)
        return ph

    hashes = {did: replay(did) for did in out}
    for did, r in out.items():
        assert r.phash == hashes[did], did

    # brute-force banding recount
    def bands(ph):
        return {(b, (ph >> (16 * b)) & 65535) for b in range(4)}

    for did, r in out.items():
        partners = [
            o for o in hashes
            if o != did and bands(hashes[did]) & bands(hashes[o])
        ]
        assert r.n_band_matches == len(partners), did
        if partners:
            mh = min(bin(hashes[did] ^ hashes[o]).count("1") for o in partners)
            assert r.min_hamming == mh, did
        else:
            assert r.min_hamming is None, did


def test_audio_hash_replay_and_bands(spark, tmp_path):
    """The envelope dHash replays the exact keystream frame energies in
    python for every doc, and band-match accounting is symmetric."""
    import hashlib
    import os

    import pandas as pd

    from timedb_spark.operators import multimodal as mm

    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 13)),
            "text": ["x"] * 12,
            "lang": ["en"] * 12,
            "source": ["s"] * 12,
            "n_chars": [1] * 12,
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    out = {r.doc_id: r for r in mm.multimodal_audio_hash(spark, d).collect()}
    assert set(out) == set(range(1, 13))

    def replay(doc_id):
        n = 256 + doc_id % 128
        need = 2 * n
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()
        body = (hx * (need // 32 + 2))[:need].encode()
        smp = [body[2 * i] + 256 * body[2 * i + 1] for i in range(n)]
        e = [sum(abs(x) for x in smp[(j * n) // 17 : ((j + 1) * n) // 17]) for j in range(17)]
        h = 0
        for j in range(16):
            h |= (1 if e[j] > e[j + 1] else 0) << j
        return h

    for did, r in out.items():
        assert r.ahash == replay(did), did

    # band-match symmetry: if a counts b as a candidate, b counts a
    def bands(h):
        return {(b, (h >> (4 * b)) & 15) for b in range(4)}

    for da, ra in out.items():
        n_match = sum(
            1 for db, rb in out.items() if db != da and bands(ra.ahash) & bands(rb.ahash)
        )
        assert ra.n_band_matches == n_match, da
