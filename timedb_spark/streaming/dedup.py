"""Streaming ingestion dedup — drop exact-duplicate documents as they land.

The streaming twin of ``operators.dedup.dedup_exact``'s key step: each
micro-batch's documents are keyed by md5 of whitespace-normalized lowered
text; ``dropDuplicates`` on that key keeps the first arrival and drops every
later duplicate across ALL micro-batches (state-store backed).

Scale posture: state is one 128-bit key per unique document. For an
unbounded feed, add an event-time watermark column and use
``dropDuplicatesWithinWatermark`` so the key store is bounded by the
watermark horizon — same plan shape, bounded state. The count aggregate is
the usual partial-agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def text_key(text_col) -> "F.Column":
    return F.md5(F.lower(F.regexp_replace(F.trim(text_col), r"\s+", " ")))


def stream_dedup(docs_stream: DataFrame) -> DataFrame:
    """documents-shaped stream → running count of UNIQUE documents seen.

    Output is a single complete-mode row (n_unique_docs) — invariant to
    arrival order, so it equals the batch ``count(distinct key)`` oracle no
    matter how the micro-batches slice the feed."""
    keyed = docs_stream.withColumn("_k", text_key(F.col("text")))
    uniq = keyed.dropDuplicates(["_k"])
    return uniq.groupBy().agg(F.count(F.lit(1)).alias("n_unique_docs"))
