"""Streaming ingestion into the snapshot store: ``foreachBatch`` +
idempotent manifest commits = exactly-once stream → table.

Structured Streaming guarantees at-least-once foreachBatch execution (a
crash between sink write and checkpoint advance replays the batch). The
snapshot store's transactional commit closes the gap: every micro-batch
commits with ``txn=(app_id, batch_id)``, and a replayed batch — same pair —
stages nothing and commits nothing. This is the same writer-txn design
Delta uses for its streaming sink, built here on the manifest protocol
(snapstore.py), and it composes with everything else the store gives:
the rollup's incremental refresh sees each micro-batch as a normal append
commit, and pinned readers never observe a half-ingested batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from timedb_spark.snapstore import SnapshotStore


def stream_append_to_store(
    sv_stream: DataFrame,
    store: SnapshotStore,
    *,
    checkpoint_dir: str,
    app_id: str = "timedb-ingest",
    timeout_s: int = 600,
) -> int:
    """Drain a ``series_values``-shaped stream into ``store`` with
    availableNow, one atomic idempotent commit per micro-batch. Returns the
    number of foreachBatch invocations THIS drain executed (replays of
    already-committed batches invoke the function but commit nothing).

    ``app_id`` must be stable across restarts of the same logical pipeline
    (it scopes batch-id dedup, like Delta's ``txnAppId``); the checkpoint
    directory carries the source offsets."""
    n_batches = 0

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        store.append_values(batch_df, txn=(app_id, int(batch_id)))

    q = (
        sv_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return n_batches
