"""Multimodal-column plumbing (SURVEY §2d): opaque ``binary`` payloads with
typed metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decoder* for real formats
is stubbed (raises ``NotImplementedError``), and tests run against a
deterministic fake format (``FAKEIMG1``) whose payload is generated JVM-side
from ``doc_id``. Everything that matters at 100 TB is real:

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

from timedb_spark.io.tables import load_table

MAGIC = "FAKEIMG1"
_CHANNELS = 3

#: formats the decoder understands; anything else is a stub.
SUPPORTED_FORMATS = {"fakeimg"}


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
    """Decode a single payload to a pixel array.

    Real formats (jpeg/png/wav/...) would dispatch to PIL/libav here — not in
    this container, so they are stubbed loudly rather than faked silently.
    """
    import numpy as np

    if fmt not in SUPPORTED_FORMATS:
        raise NotImplementedError(
            f"decoder for format {fmt!r} requires an image/audio library not present in this container"
        )
    if payload[:8] != MAGIC.encode():
        raise ValueError("bad magic")
    px = np.frombuffer(payload[8:], dtype=np.uint8).astype(np.float64)
    expected = width * height * _CHANNELS
    if px.size != expected:
        raise ValueError(f"payload size {px.size} != w*h*c {expected}")
    return px


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
       sum(8 + (8 + doc_id % 9) * (8 + (doc_id // 3) % 7) * 3) AS total_bytes,
       sum((8 + doc_id % 9) * (8 + (doc_id // 3) % 7) * 3) AS total_pixels,
       min(8 + doc_id % 9) AS min_width,
       max(8 + (doc_id // 3) % 7) AS max_height
FROM documents
"""
