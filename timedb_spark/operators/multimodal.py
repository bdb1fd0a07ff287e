"""Multimodal-column plumbing (SURVEY §2d): opaque ``binary`` payloads with
typed metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so two REAL formats are decoded
with stdlib-only codecs — PNG (struct + zlib chunk walk, inflate, all five
scanline filters) and PCM16 WAV (the ``wave`` module) — while the
deterministic fake format (``FAKEIMG1``, payload generated JVM-side from
``doc_id``) remains the zero-Python bulk path; anything else (jpeg, mp4)
raises loudly rather than faking silently. Everything that matters at
100 TB is real:

- payload is a true ``binary`` column (Arrow ``large_binary`` over the wire),
- metadata travels as typed columns (``width``/``height``/``channels``/
  ``fmt``), never re-parsed from bytes in the hot path,
- decode/feature-extract is ``mapInPandas`` (one Python process per task,
  Arrow batches, no per-row pickling), schema declared up front,
- batch shape is independent of partitioning: the UDF is row-local, so
  repartitioning only changes parallelism, never results.

Fake payload layout: 8-byte ASCII magic ``FAKEIMG1`` followed by
``width*height*channels`` pseudo-pixel bytes — a repeating md5 keystream of
the doc id, so any slice of the payload is reproducible from metadata alone.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from timedb_spark.functions.rounding import floor6_sql
from timedb_spark.io.tables import load_table

MAGIC = "FAKEIMG1"
_CHANNELS = 3

#: formats the decoder understands; anything else raises loudly.
#: ``png`` is decoded by the stdlib-only codec below (zlib + struct — no
#: image library needed); ``fakeimg`` is the synthetic bulk-path format.
SUPPORTED_FORMATS = {"fakeimg", "png"}

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA


# ---------------------------------------------------------------------------
# stdlib PNG codec (decode + encode) — a REAL format, no image libs
# ---------------------------------------------------------------------------


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced PNG (gray/RGB/RGBA) to pixel bytes.

    Pure stdlib (struct + zlib) + numpy unfiltering: chunk walk → IHDR parse
    → concatenated-IDAT inflate → per-scanline filter reversal (all five
    filter types: None/Sub/Up/Average/Paeth). Returns
    ``(pixels_2d, width, height, channels)`` with pixels shaped
    ``(height, width*channels)`` uint8.

    Sub/Up are vectorized; Average/Paeth run a per-byte loop — fine for the
    thumbnail-sized payloads here, and the mapInPandas plumbing is identical
    when a C decoder (PIL/libvips) is dropped in for production images.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, idat = 8, []
    width = height = bit_depth = color_type = None
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        if pos + 12 + ln > len(payload):
            # bound the data+CRC slice BEFORE unpacking: a truncated payload
            # must raise the codec's own ValueError, not leak struct.error
            # out of the mapInPandas decode path
            raise ValueError("truncated PNG: chunk extends past end of payload")
        data = payload[pos + 8 : pos + 8 + ln]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])[0]:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG variant not supported by the stdlib codec: depth={bit_depth} "
                    f"color={color_type} interlace={interlace}"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color_type]
    stride, bpp = width * channels, channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8).astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: per-lane running sum
            rec = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
        elif f == 2:  # Up
            rec = line + prior
        elif f in (3, 4):  # Average / Paeth: sequential dependency chain
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec & 0xFF
    return out, width, height, channels


def encode_png(pixels, width: int, height: int, channels: int = _CHANNELS, row_filter: int = 0) -> bytes:
    """Encode pixel bytes (shape ``(height, width*channels)`` uint8) as a
    valid 8-bit PNG using only struct + zlib. ``row_filter`` applies one of
    the five PNG filters to every scanline (exercised by the round-trip
    tests; filter 0 is the fast path)."""
    import struct
    import zlib

    import numpy as np

    color_type = {1: 0, 3: 2, 4: 6}[channels]
    px = np.asarray(pixels, dtype=np.uint8).reshape(height, width * channels)
    bpp = channels
    lines = []
    for y in range(height):
        line = px[y].astype(np.int64)
        prior = px[y - 1].astype(np.int64) if y else np.zeros_like(line)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), line[:-bpp]]) if line.size > bpp else np.zeros_like(line)
        pleft = (
            np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]]) if line.size > bpp else np.zeros_like(line)
        )
        if row_filter == 0:
            filt = line
        elif row_filter == 1:
            filt = line - left
        elif row_filter == 2:
            filt = line - prior
        elif row_filter == 3:
            filt = line - ((left + prior) >> 1)
        elif row_filter == 4:
            p = left + prior - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft))
            filt = line - pred
        else:
            raise ValueError(f"unknown PNG filter {row_filter}")
        lines.append(bytes([row_filter]) + (filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# payload synthesis (JVM-side — no Python in the generate path)
# ---------------------------------------------------------------------------


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata to each doc.

    All expression-level (codegen'd): the md5 keystream, repeat, truncation
    and binary cast run JVM-side, so synthesizing payloads for 10^10 rows is
    a scan + projection with zero shuffles.
    """
    width = (F.lit(8) + F.col("doc_id") % 9).cast("int")
    height = (F.lit(8) + (F.col("doc_id") / F.lit(3)).cast("long") % 7).cast("int")
    out = (
        docs.withColumn("width", width)
        .withColumn("height", height)
        .withColumn("fmt", F.lit("fakeimg"))
        .withColumn("channels", F.lit(_CHANNELS))
    )
    # md5 keystream of the doc id, repeated to cover width*height*channels
    # bytes (hex chars used as bytes: 1 hex char -> 1 ascii byte).
    body = F.expr(
        "substring(repeat(md5(cast(doc_id as string)), cast(width*height*3/32 as int)+1), 1, width*height*3)"
    )
    payload = F.encode(F.concat(F.lit(MAGIC), body), "UTF-8")
    return out.withColumn("payload", payload).drop("text")


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas — the real scale plumbing)
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),  # 2x2 block-mean
    ]
)


def _decode_one(payload: bytes, fmt: str, width: int, height: int):
    """Decode a single payload to a flat float pixel array.

    ``png`` runs the stdlib codec (real chunk walk, inflate, unfiltering)
    and cross-checks the IHDR dimensions against the typed metadata columns;
    ``fakeimg`` is the synthetic raw format. Other formats (jpeg/wav/...)
    would dispatch to PIL/libav — not in this container, so they raise
    loudly rather than fake silently.
    """
    import numpy as np

    if fmt not in SUPPORTED_FORMATS:
        raise NotImplementedError(
            f"decoder for format {fmt!r} requires an image/audio library not present in this container"
        )
    if fmt == "png":
        px2d, w, h, _c = decode_png(bytes(payload))
        if (w, h) != (width, height):
            raise ValueError(f"PNG IHDR {w}x{h} != metadata {width}x{height}")
        return px2d.reshape(-1).astype(np.float64)
    if payload[:8] != MAGIC.encode():
        raise ValueError("bad magic")
    px = np.frombuffer(payload[8:], dtype=np.uint8).astype(np.float64)
    expected = width * height * _CHANNELS
    if px.size != expected:
        raise ValueError(f"payload size {px.size} != w*h*c {expected}")
    return px


def keystream_pixels(doc_id: int, width: int, height: int):
    """The deterministic pseudo-pixel stream for a doc id — the Python twin
    of the JVM md5-keystream expression in :func:`attach_payload` (hex chars
    of repeated md5(doc_id) used as ascii bytes)."""
    import hashlib

    import numpy as np

    n = width * height * _CHANNELS
    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    body = (hx * (n // 32 + 1))[:n]
    return np.frombuffer(body.encode(), dtype=np.uint8)


def attach_payload_mixed(docs: DataFrame, *, png_every: int = 7) -> DataFrame:
    """:func:`attach_payload`, but every ``png_every``-th doc carries a REAL
    PNG encoding of its keystream pixels instead of the raw fakeimg bytes —
    so the decode path exercises the genuine chunk-walk/inflate/unfilter
    codec inside the same mapInPandas plumbing.

    The PNG re-encode itself is an Arrow-batched ``mapInPandas`` (row-local,
    no shuffle); pixel content is identical between the two formats for the
    same doc id, which the tests exploit (decoded features must match the
    fakeimg features bit-for-bit)."""
    from pyspark.sql import types as TT

    base = attach_payload(docs)
    schema = TT.StructType(base.schema.fields)

    def reencode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_png = (pdf["doc_id"] % png_every) == 0
            if is_png.any():
                pdf = pdf.copy()
                enc = [
                    encode_png(keystream_pixels(int(r.doc_id), int(r.width), int(r.height)).reshape(int(r.height), -1),
                               int(r.width), int(r.height))
                    for r in pdf[is_png].itertuples(index=False)
                ]
                pdf.loc[is_png, "payload"] = pd.Series(enc, index=pdf.index[is_png], dtype=object)
                pdf.loc[is_png, "fmt"] = "png"
            yield pdf

    return base.mapInPandas(reencode, schema=schema)


def decode_features(df: DataFrame, *, thumb_grid: int = 2) -> DataFrame:
    """Arrow-batched decode + feature extraction.

    Row-local per batch ⇒ embarrassingly parallel; Spark feeds Arrow batches
    (spark.sql.execution.arrow.maxRecordsPerBatch) regardless of partition
    count, so executor memory is bounded by batch size, not partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = _decode_one(bytes(row.payload), row.fmt, row.width, row.height)
                # block-mean "resize" to thumb_grid x thumb_grid over the
                # flat pixel stream (channel-agnostic, deterministic).
                chunks = np.array_split(px, thumb_grid * thumb_grid)
                thumb = [float(c.mean()) if c.size else 0.0 for c in chunks]
                out.append(
                    (
                        row.doc_id,
                        row.fmt,
                        row.width,
                        row.height,
                        int(len(row.payload)),
                        float(px.mean()),
                        float(px.std()),
                        thumb,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, *, every: int = 4) -> DataFrame:
    """'Video' frame sampling: treat each row's payload as ``height`` frames
    of ``width*channels`` bytes and keep every ``every``-th frame.

    Pure JVM: posexplode over a generated frame index — no Python, no UDF.
    At scale the explode multiplies rows but stays pipelined (no shuffle).
    """
    n_frames = F.col("height")
    frame_len = F.col("width") * F.lit(_CHANNELS)
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every))).alias("frame_idx")
    return df.select("doc_id", "width", "height", "payload", idx).select(
        "doc_id",
        "frame_idx",
        # +9: skip 8 magic bytes, substring is 1-based.
        F.substring(F.col("payload"), F.col("frame_idx") * frame_len + 9, frame_len).alias("frame"),
    )


# ---------------------------------------------------------------------------
# driver-contract query: metadata plumbing (SQL-expressible part)
# ---------------------------------------------------------------------------


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload metadata audit: per-format byte totals — checks the typed-
    metadata path (width/height/fmt) and payload sizing end-to-end."""
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("fmt").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum((F.col("width") * F.col("height") * F.lit(_CHANNELS))).alias("total_pixels"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


MULTIMODAL_META_SQL = """
SELECT 'fakeimg' AS fmt,
       count(*) AS n_docs,
       CAST(sum(8 + (8 + doc_id % 9) * (8 + (doc_id // 3) % 7) * 3) AS BIGINT) AS total_bytes,
       CAST(sum((8 + doc_id % 9) * (8 + (doc_id // 3) % 7) * 3) AS BIGINT) AS total_pixels,
       min(8 + doc_id % 9) AS min_width,
       max(8 + (doc_id // 3) % 7) AS max_height
FROM documents
"""


# ---------------------------------------------------------------------------
# audio modality: stdlib WAV codec + feature extraction
# ---------------------------------------------------------------------------

_WAV_RATE = 8000  # Hz


def encode_wav(samples, rate: int = _WAV_RATE) -> bytes:
    """PCM16 mono WAV from an int16 sample array — pure stdlib (``wave``)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """WAV → (int16 samples, rate, n_channels). Real RIFF parsing via the
    stdlib ``wave`` module — a genuine second-modality decoder alongside
    the PNG codec; PCM16 only (the overwhelmingly common landing format)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV is decoded here")
        rate, nch = w.getframerate(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2"), rate, nch


def keystream_samples(doc_id: int, n: int):
    """Deterministic pseudo-audio: the doc's md5 keystream bytes
    reinterpreted as ``n`` little-endian int16 samples — reproducible from
    the doc id alone, like the image keystream."""
    import hashlib

    import numpy as np

    need = 2 * n
    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    body = (hx * (need // 32 + 2))[:need].encode()
    return np.frombuffer(body, dtype="<i2")


def attach_audio_payload(docs: DataFrame, *, n_samples_base: int = 256) -> DataFrame:
    """Attach a REAL WAV payload per doc: ``n_samples_base + doc_id % 128``
    deterministic PCM16 samples encoded through the stdlib writer inside an
    Arrow-batched ``mapInPandas`` (audio encode is inherently Python-side;
    batches bound memory, rows never shuffle)."""
    from pyspark.sql import types as TT

    out_schema = TT.StructType(
        [
            TT.StructField("doc_id", TT.LongType()),
            TT.StructField("fmt", TT.StringType()),
            TT.StructField("n_samples", TT.IntegerType()),
            TT.StructField("sample_rate", TT.IntegerType()),
            TT.StructField("payload", TT.BinaryType()),
        ]
    )

    base = docs.select("doc_id")

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = (n_samples_base + pdf["doc_id"] % 128).astype(int)
            payloads = [
                encode_wav(keystream_samples(int(d), int(k))) for d, k in zip(pdf["doc_id"], n)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": "wav",
                    "n_samples": n,
                    "sample_rate": _WAV_RATE,
                    "payload": pd.Series(payloads, index=pdf.index, dtype=object),
                }
            )

    return base.mapInPandas(enc, schema=out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode WAV payloads and extract per-clip features: duration,
    RMS level, zero-crossing count, peak amplitude. Cross-checked against
    the typed metadata columns (n_samples) like the PNG path."""
    from pyspark.sql import types as TT

    schema = TT.StructType(
        [
            TT.StructField("doc_id", TT.LongType()),
            TT.StructField("n_samples", TT.IntegerType()),
            TT.StructField("duration_ms", TT.DoubleType()),
            TT.StructField("rms", TT.DoubleType()),
            TT.StructField("n_zero_crossings", TT.IntegerType()),
            TT.StructField("peak", TT.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                s, rate, _nch = decode_wav(bytes(row.payload))
                if s.size != row.n_samples:
                    raise ValueError(f"decoded {s.size} samples != metadata {row.n_samples}")
                sf = s.astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(sf[1:]) != np.signbit(sf[:-1]))) if s.size > 1 else 0
                out.append(
                    (
                        row.doc_id,
                        int(s.size),
                        float(s.size * 1000.0 / rate),
                        float(np.sqrt((sf * sf).mean())) if s.size else 0.0,
                        zc,
                        int(np.abs(sf).max()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# full DuckDB oracles for the decode paths (r5): the keystream payloads are
# SQL-reproducible, so the gate can value-hash the DECODED features instead
# of settling for rows-only — the PNG docs decode to pixels identical to
# their fakeimg twins by construction, so one keystream recompute covers
# both codecs.
# ---------------------------------------------------------------------------

def _chunk_mean_sql(c: int) -> str:
    """%.6f-formatted mean of thumb chunk ``c`` (np.array_split semantics:
    first n%4 chunks get one extra element)."""
    start = f"({c}*(n//4) + least({c}, n%4) + 1)"
    ln = f"(n//4 + CASE WHEN {c} < n%4 THEN 1 ELSE 0 END)"
    s = f"list_sum(list_transform(range({start}, {start}+{ln}), i -> ascii(substr(body, CAST(i AS INT), 1))))"
    return f"printf('%.6f', CAST({s} AS DOUBLE) / {ln})"


DECODE_FEATURES_SQL = f"""
WITH meta AS (
    SELECT doc_id, (8 + doc_id % 9) AS width, (8 + (doc_id // 3) % 7) AS height
    FROM documents
), b AS (
    SELECT doc_id, width, height, width*height*3 AS n,
           substring(repeat(md5(CAST(doc_id AS VARCHAR)),
                            CAST((width*height*3) // 32 + 1 AS INT)), 1, width*height*3) AS body
    FROM meta
), agg AS (
    SELECT doc_id, width, height, n, body,
           CAST(list_sum(list_transform(range(1, n+1), i -> ascii(substr(body, CAST(i AS INT), 1)))) AS BIGINT) AS sx,
           CAST(list_sum(list_transform(range(1, n+1), i -> ascii(substr(body, CAST(i AS INT), 1)) * ascii(substr(body, CAST(i AS INT), 1)))) AS BIGINT) AS sxx
    FROM b
)
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'png' ELSE 'fakeimg' END AS fmt,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       {floor6_sql('CAST(sx AS DOUBLE) / n')} AS mean_px,
       {floor6_sql('sqrt(CAST(sxx AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n) * (CAST(sx AS DOUBLE)/n))')} AS std_px,
       {_chunk_mean_sql(0)} || '|' || {_chunk_mean_sql(1)} || '|' || {_chunk_mean_sql(2)} || '|' || {_chunk_mean_sql(3)} AS thumb
FROM agg
"""


AUDIO_FEATURES_SQL = f"""
WITH meta AS (
    SELECT doc_id, CAST(256 + doc_id % 128 AS INT) AS n_samples
    FROM documents
), b AS (
    SELECT doc_id, n_samples,
           substring(repeat(md5(CAST(doc_id AS VARCHAR)),
                            CAST((2*n_samples) // 32 + 2 AS INT)), 1, 2*n_samples) AS body
    FROM meta
), s AS (
    -- little-endian int16: sample i = byte(2i-1) + 256*byte(2i); hex-char
    -- bytes are < 128, so the sign bit is never set (values stay positive)
    SELECT doc_id, n_samples,
           list_transform(range(1, n_samples+1),
                          i -> ascii(substr(body, CAST(2*i-1 AS INT), 1))
                               + 256 * ascii(substr(body, CAST(2*i AS INT), 1))) AS smp
    FROM b
)
SELECT doc_id,
       n_samples,
       CAST(n_samples AS DOUBLE) * 1000.0 / 8000.0 AS duration_ms,
       {floor6_sql('sqrt(CAST(list_sum(list_transform(smp, x -> x*x)) AS DOUBLE) / n_samples)')} AS rms,
       CAST(list_sum(list_transform(range(2, n_samples+1),
            i -> CASE WHEN (smp[CAST(i AS INT)] < 0) != (smp[CAST(i-1 AS INT)] < 0) THEN 1 ELSE 0 END)) AS INT)
           AS n_zero_crossings,
       CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak
FROM s
"""


# ---------------------------------------------------------------------------
# perceptual hash (dHash) + banded near-duplicate candidates
# ---------------------------------------------------------------------------

#: dHash grid: 10 cells wide × 7 tall → 9 × 7 = 63 horizontal-gradient bits
#: (63, not 64, keeps the hash a POSITIVE signed int64 in both engines).
_PHASH_W, _PHASH_H = 10, 7
_PHASH_BITS = (_PHASH_W - 1) * _PHASH_H
_PHASH_BANDS = 4  # 16/16/16/15 bit slices; hamming ≤ 3 ⇒ one band collides

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash_docs(df: DataFrame) -> DataFrame:
    """payload → 63-bit dHash per doc (mapInPandas, Arrow-batched).

    The 'resize' is a fixed 10×7 block-mean grid over the flat pixel
    stream with integer cell bounds floor(j·n/70): each gradient bit
    compares neighbouring cell MEANS as the exact cross-product
    sum_a·len_b > sum_b·len_a — no floats anywhere, so the SQL oracle
    reproduces the hash bit-for-bit from the same md5 keystream. Real
    pHash/dHash swaps this block for a PIL resize; the Spark-side
    plumbing (batch shape, packing, banding) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ncells = _PHASH_W * _PHASH_H
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                if payload[:8] != MAGIC.encode():
                    raise ValueError("bad magic")
                px = np.frombuffer(payload[8:], dtype=np.uint8).astype(np.int64)
                n = int(px.size)
                cs = np.concatenate(([0], np.cumsum(px)))
                sums = [int(cs[(j + 1) * n // ncells] - cs[j * n // ncells]) for j in range(ncells)]
                lens = [(j + 1) * n // ncells - j * n // ncells for j in range(ncells)]
                h = 0
                for r in range(_PHASH_H):
                    for c in range(_PHASH_W - 1):
                        a, b = r * _PHASH_W + c, r * _PHASH_W + c + 1
                        if sums[a] * lens[b] > sums[b] * lens[a]:
                            h |= 1 << (r * (_PHASH_W - 1) + c)
                out.append((row.doc_id, h))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return df.mapInPandas(run, schema=PHASH_SCHEMA)


def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perceptual hash + banded near-duplicate candidate stats:
    the image-dedup plumbing (dHash → 4-band LSH → exact hamming on
    collisions only) over the synthetic payloads. Per doc: the hash, how
    many other docs share at least one 16-bit band (candidate set size),
    and the minimum exact hamming distance among those candidates — the
    numbers an image-dedup threshold is tuned on.

    Scale shape is dedup_minhash's: candidate pairs come ONLY from the
    band equi-join (never all-pairs); exact hamming (bit_count of xor)
    runs on collisions alone. At 100 TB the band join is the standard
    LSH shuffle on (band_idx, band_value) keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    ph = phash_docs(attach_payload(docs))
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.array(*[F.lit(b) for b in range(_PHASH_BANDS)])).alias("bi"),
    ).withColumn("bval", F.expr("shiftright(phash, bi * 16) & 65535"))
    a = bands.select(F.col("doc_id").alias("da"), F.col("phash").alias("pa"), "bi", "bval")
    # merge hint: band frames are explode-derived (linear in the corpus) —
    # Catalyst's post-explode estimate is the pre-explode scan size, so a
    # side would be STATICALLY broadcast (the scaleprobe r12 driver-OOM
    # class; AQE cannot demote it).
    b = bands.select(F.col("doc_id").alias("db"), F.col("phash").alias("pb"), "bi", "bval").hint("merge")
    # hamming BEFORE the pair-distinct (r14, guide §2.2): h is a function
    # of the pair, so distinct(da, db, h) has exactly the cardinality of
    # distinct(da, db, pa, pb) — but the distinct's exchange carries one
    # small int instead of two 64-bit hashes (the widest columns of the
    # widest shuffle in this plan). bit_count(xor) on the pre-distinct
    # rows (≤ 4× per pair, one per matching band) is arithmetic; the
    # shuffle bytes are the scale cost.
    cand = (
        a.join(b, ["bi", "bval"])
        .filter(F.col("da") != F.col("db"))
        .select("da", "db", F.expr("bit_count(pa ^ pb)").cast("int").alias("h"))
        .distinct()
    )
    agg = cand.groupBy(F.col("da").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_band_matches"),
        F.min("h").cast("int").alias("min_hamming"),
    )
    return ph.join(agg, "doc_id", "left").select(
        "doc_id",
        "phash",
        F.coalesce("n_band_matches", F.lit(0).cast("long")).alias("n_band_matches"),
        "min_hamming",
    )


_PHASH_CELL = f"""list_transform(range(0, {_PHASH_W * _PHASH_H}), j -> struct_pack(
            s := CAST(list_sum(list_transform(
                     range(j * n // {_PHASH_W * _PHASH_H} + 1, (j + 1) * n // {_PHASH_W * _PHASH_H} + 1),
                     i -> ascii(substr(body, CAST(i AS INT), 1)))) AS BIGINT),
            l := CAST((j + 1) * n // {_PHASH_W * _PHASH_H} - j * n // {_PHASH_W * _PHASH_H} AS BIGINT)))"""

MULTIMODAL_PHASH_SQL = f"""
WITH meta AS (
    SELECT doc_id, (8 + doc_id % 9) AS width, (8 + (doc_id // 3) % 7) AS height
    FROM documents
), b AS (
    SELECT doc_id, width*height*3 AS n,
           substring(repeat(md5(CAST(doc_id AS VARCHAR)),
                            CAST((width*height*3) // 32 + 1 AS INT)), 1, width*height*3) AS body
    FROM meta
), cells AS (
    SELECT doc_id, {_PHASH_CELL} AS cl FROM b
), ph AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, {_PHASH_BITS}), k ->
               CASE WHEN cl[CAST(k // {_PHASH_W - 1} * {_PHASH_W} + k % {_PHASH_W - 1} AS INT) + 1].s
                         * cl[CAST(k // {_PHASH_W - 1} * {_PHASH_W} + k % {_PHASH_W - 1} AS INT) + 2].l
                       > cl[CAST(k // {_PHASH_W - 1} * {_PHASH_W} + k % {_PHASH_W - 1} AS INT) + 2].s
                         * cl[CAST(k // {_PHASH_W - 1} * {_PHASH_W} + k % {_PHASH_W - 1} AS INT) + 1].l
                    THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
    FROM cells
), bands AS (
    SELECT doc_id, phash, unnest([0, 1, 2, 3]) AS bi FROM ph
), bv AS (
    SELECT doc_id, phash, bi, (phash >> (16 * bi)) & 65535 AS bval FROM bands
), cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.phash AS pa, b.phash AS pb
    FROM bv a JOIN bv b ON a.bi = b.bi AND a.bval = b.bval AND a.doc_id != b.doc_id
), agg AS (
    SELECT da AS doc_id,
           CAST(count(*) AS BIGINT) AS n_band_matches,
           CAST(min(bit_count(xor(pa, pb))) AS INT) AS min_hamming
    FROM cand GROUP BY da
)
SELECT p.doc_id, p.phash,
       coalesce(a.n_band_matches, CAST(0 AS BIGINT)) AS n_band_matches,
       a.min_hamming
FROM ph p LEFT JOIN agg a ON a.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
# audio fingerprint — envelope dHash + banded near-dup stats
# ---------------------------------------------------------------------------

_AHASH_FRAMES = 17   # 16 gradient bits
_AHASH_BANDS = 4     # 4 bits per band


def audio_hash_docs(df: DataFrame) -> DataFrame:
    """Decode WAV payloads and compute a 16-bit envelope dHash per clip:
    split the samples into 17 index frames, sum |amplitude| per frame
    (exact integers), bit j = 1 iff frame j's energy exceeds frame j+1's —
    the audio twin of the image dHash (gradient of the energy envelope,
    robust to level scaling). Runs in the same Arrow-batched mapInPandas
    as :func:`audio_features` — the real decode path, rows never
    shuffle."""
    from pyspark.sql import types as TT

    schema = TT.StructType(
        [
            TT.StructField("doc_id", TT.LongType()),
            TT.StructField("ahash", TT.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                s, _rate, _nch = decode_wav(bytes(row.payload))
                a = np.abs(s.astype(np.int64))
                n = a.size
                e = [
                    int(a[(j * n) // _AHASH_FRAMES : ((j + 1) * n) // _AHASH_FRAMES].sum())
                    for j in range(_AHASH_FRAMES)
                ]
                h = 0
                for j in range(_AHASH_FRAMES - 1):
                    h |= (1 if e[j] > e[j + 1] else 0) << j
                out.append((row.doc_id, h))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    return df.mapInPandas(run, schema=schema)


def multimodal_audio_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip audio fingerprint + banded near-duplicate candidate stats —
    the audio member of the perceptual-dedup family (multimodal_phash for
    images, this for clips): the 16-bit envelope dHash, how many other
    clips share at least one 4-bit band, and the minimum exact hamming
    distance among those candidates.

    Scale shape is multimodal_phash's verbatim: candidates ONLY from the
    (band_idx, band_value) equi-join — the standard LSH shuffle — with
    exact hamming (bit_count of xor) on collisions alone. The oracle
    recomputes every decoded frame energy from the md5 keystream in SQL
    (the multimodal_audio convention), so the hash is value-checked
    end-to-end through the REAL wave codec."""
    docs = load_table(spark, sf_dir, "documents")
    ah = audio_hash_docs(attach_audio_payload(docs))
    # r14 rewrite (guide §2.3 "shuffle keys and metadata instead of
    # payloads" / §8 "decide with small rows"): both band-collision and
    # exact hamming depend only on the HASH VALUES, and the 16-bit hash
    # space caps distinct hashes at 65,536 regardless of corpus size — so
    # the band self-join runs over the distinct-hash frame (one count per
    # hash), never over docs. Doc-level it is quadratic in the per-band
    # bucket population (4-bit bands ⇒ 16 buckets/band: measured sf0.1,
    # 5,000 docs → 7.67M distinct doc pairs vs 1.82M hash pairs from 2,477
    # distinct hashes; at 100 TB doc pairs grow ~n²/64 while hash pairs
    # saturate at the 2^16 ceiling). Every frame here is bounded by that
    # ceiling, so the joins broadcast by construction and per-doc stats
    # attach with one broadcast join — identical output, proved per-row by
    # the unchanged DuckDB oracle.
    hh = ah.groupBy("ahash").agg(F.count(F.lit(1)).alias("cnt"))
    hbands = hh.select(
        "ahash",
        "cnt",
        F.explode(F.array(*[F.lit(b) for b in range(_AHASH_BANDS)])).alias("bi"),
    ).withColumn("bval", F.expr("shiftright(ahash, bi * 4) & 15"))
    a = hbands.select(F.col("ahash").alias("ha"), "bi", "bval")
    b = hbands.select(F.col("ahash").alias("hb"), F.col("cnt").alias("cnt_b"), "bi", "bval")
    pairs = (
        a.join(F.broadcast(b), ["bi", "bval"])
        .filter(F.col("ha") != F.col("hb"))
        .select("ha", "hb", "cnt_b")
        .distinct()
    )
    other = pairs.groupBy(F.col("ha").alias("ahash")).agg(
        F.sum("cnt_b").alias("n_other"),
        F.min(F.expr("bit_count(ha ^ hb)")).alias("mh_other"),
    )
    # same-hash docs collide in every band: they contribute cnt-1 matches
    # and force min_hamming to 0 whenever the hash is shared.
    stats = hh.join(F.broadcast(other), "ahash", "left").select(
        "ahash",
        (F.col("cnt") - 1 + F.coalesce(F.col("n_other"), F.lit(0))).alias("n_band_matches"),
        F.when(F.col("cnt") > 1, F.lit(0)).otherwise(F.col("mh_other")).cast("int").alias("min_hamming"),
    )
    return ah.join(F.broadcast(stats), "ahash").select(
        "doc_id",
        "ahash",
        "n_band_matches",
        "min_hamming",
    )


_AHASH_FRAME_E = f"""list_transform(range(0, {_AHASH_FRAMES}), j -> CAST(list_sum(
        list_transform(range(j * n_samples // {_AHASH_FRAMES} + 1,
                             (j + 1) * n_samples // {_AHASH_FRAMES} + 1),
                       i -> abs(smp[CAST(i AS INT)]))) AS BIGINT))"""

MULTIMODAL_AUDIO_HASH_SQL = f"""
WITH meta AS (
    SELECT doc_id, CAST(256 + doc_id % 128 AS INT) AS n_samples
    FROM documents
), b AS (
    SELECT doc_id, n_samples,
           substring(repeat(md5(CAST(doc_id AS VARCHAR)),
                            CAST((2*n_samples) // 32 + 2 AS INT)), 1, 2*n_samples) AS body
    FROM meta
), s AS (
    SELECT doc_id, n_samples,
           list_transform(range(1, n_samples+1),
                          i -> ascii(substr(body, CAST(2*i-1 AS INT), 1))
                               + 256 * ascii(substr(body, CAST(2*i AS INT), 1))) AS smp
    FROM b
), e AS (
    SELECT doc_id, {_AHASH_FRAME_E} AS fe FROM s
), h AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(1, {_AHASH_FRAMES}),
               j -> CASE WHEN fe[CAST(j AS INT)] > fe[CAST(j AS INT) + 1]
                         THEN CAST(pow(2, j - 1) AS BIGINT) ELSE 0 END)) AS BIGINT) AS ahash
    FROM e
), bands AS (
    SELECT doc_id, ahash, bi, (ahash >> (bi * 4)) & 15 AS bval
    FROM h CROSS JOIN (SELECT unnest(range(0, {_AHASH_BANDS})) AS bi) bb
), cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.ahash AS pa, b.ahash AS pb
    FROM bands a JOIN bands b ON a.bi = b.bi AND a.bval = b.bval AND a.doc_id != b.doc_id
), agg AS (
    SELECT da AS doc_id, count(*) AS n_band_matches,
           CAST(min(bit_count(xor(pa, pb))) AS INT) AS min_hamming
    FROM cand GROUP BY da
)
SELECT h.doc_id, h.ahash,
       CAST(coalesce(a.n_band_matches, 0) AS BIGINT) AS n_band_matches,
       a.min_hamming
FROM h LEFT JOIN agg a ON a.doc_id = h.doc_id
"""
