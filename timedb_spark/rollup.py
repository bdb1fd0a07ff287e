"""Continuous aggregate over the snapshot store: a materialized hourly
rollup of ``series_values`` that refreshes INCREMENTALLY from manifest
diffs — the TimescaleDB continuous-aggregate / materialized-view-refresh
analogue, Spark-first.

Why manifests make this cheap: an append commit lists exactly which data
files it added, so a refresh aggregates ONLY the files committed since the
last refreshed version and merges the partials into the materialized state
(count/sum/min/max are all decomposable, avg derives at read). At 100 TB a
daily refresh scans the day's files, never the table. Rewrite commits
(compact / delete_series / ttl) remove files, which decomposable merges
cannot subtract (min/max are not invertible) — those trigger a full
recompute, detected from the manifest diff, and compaction does not change
aggregate VALUES anyway (same rows, fewer files), so the recompute is a
correctness fallback for deletes, not the steady-state path.

The materialized state itself commits through a tiny manifest of its own
(same O_EXCL pattern), so readers of the rollup see whole refreshes
atomically and the refresh records which store version it reflects.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timedb_spark.session import micros_parquet_writes
from timedb_spark.snapstore import SnapshotStore

#: decimal type for exact, order-free partial sums
_DSUM = "decimal(38,6)"


def _hourly_partial(df: DataFrame) -> DataFrame:
    """Decomposable per-(series, hour) partial: n / sum / min / max."""
    return df.groupBy(
        "series_id", F.date_trunc("hour", "valid_time").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DSUM)).alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


def _merge_partials(df: DataFrame) -> DataFrame:
    """Re-combine partials that share a (series, bucket) key."""
    return df.groupBy("series_id", "bucket").agg(
        F.sum("n").alias("n"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


class ContinuousAggregate:
    """Materialized hourly rollup bound to one :class:`SnapshotStore`."""

    def __init__(self, store: SnapshotStore, name: str = "hourly", state_retention_s: float = 600.0):
        self.store = store
        self.spark = store.spark
        self.root = store.root / f"_rollup_{name}"
        self.state_dir = self.root / "state"
        self.meta_path = self.root / "META.json"
        #: grace window before a superseded state dir is deleted — a reader
        #: holding the lazy DataFrame from read() (resolved against the old
        #: META) must be able to execute its action after the swap. Same
        #: pinned-reader contract as the store's vacuum min_age_s.
        self.state_retention_s = state_retention_s

    # -- state bookkeeping -------------------------------------------------

    def _meta(self) -> dict:
        if not self.meta_path.exists():
            return {"refreshed_version": 0, "state": None, "files": []}
        return json.loads(self.meta_path.read_text())

    def _commit_meta(self, version: int, state_rel: str, files: list[str]) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        tmp = self.root / f".meta-{uuid.uuid4().hex}"
        tmp.write_text(
            json.dumps(
                {
                    "refreshed_version": version,
                    "state": state_rel,
                    "files": files,
                    "refreshed_at": datetime.now(timezone.utc).isoformat(),
                }
            )
        )
        os.replace(tmp, self.meta_path)  # atomic: readers see old or new, never half

    # -- refresh -----------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the rollup up to the store's latest version.

        Returns stats including the refresh ``mode`` ("noop" | "incremental"
        | "full") and how many data files were scanned — the incremental
        path's scan is bounded by the new commits, never the table.

        Template method: the manifest-diff preamble and the atomic
        state-commit/GC tail are shared with every subclass; only
        :meth:`_compute_merged` (how the new state frame is produced)
        varies. Keeps concurrency-sensitive logic (the version pin, the
        META swap) in exactly one place."""
        meta = self._meta()
        cur_v, cur_files = self.store._load()
        if cur_v == meta["refreshed_version"]:
            return {"mode": "noop", "version": cur_v, "files_scanned": 0, **self._noop_extra()}
        old_files = set(meta["files"])
        new_files = [f for f in cur_files if f not in old_files]
        removed = old_files - set(cur_files)

        merged, mode, scanned, extra = self._compute_merged(meta, cur_v, cur_files, new_files, removed)

        state_rel = f"state/v{cur_v:012d}-{uuid.uuid4().hex[:8]}"
        with micros_parquet_writes(self.spark):
            merged.write.mode("overwrite").parquet(str(self.root / state_rel))
        self._commit_meta(cur_v, state_rel, cur_files)
        self._gc_states(keep=state_rel)
        return {"mode": mode, "version": cur_v, "files_scanned": scanned, **extra}

    def _noop_extra(self) -> dict:
        return {}

    def _compute_merged(self, meta, cur_v, cur_files, new_files, removed):
        """(merged_frame, mode, files_scanned, extra_stats) for a non-noop
        refresh. Decomposable partials: append commits merge map-side;
        removed files (deletes/TTL) can't be subtracted (min/max aren't
        invertible) → full recompute from the pinned manifest's file set."""
        base = str(self.store.values_path)
        if meta["state"] is not None and not removed:
            if new_files:
                delta = _hourly_partial(
                    self.spark.read.option("basePath", base).parquet(*[f"{base}/{f}" for f in new_files])
                )
                prev = self.spark.read.parquet(str(self.root / meta["state"]))
                merged = _merge_partials(prev.unionByName(delta))
            else:
                merged = self.spark.read.parquet(str(self.root / meta["state"]))
            return merged, "incremental", len(new_files), {}
        if cur_files:
            merged = _hourly_partial(
                self.spark.read.option("basePath", base).parquet(*[f"{base}/{f}" for f in cur_files])
            )
        else:
            merged = _hourly_partial(self.store.read_values(version=cur_v))
        return merged, "full", len(cur_files), {}

    def _gc_states(self, keep: str) -> int:
        """Delete superseded state dirs AGED past the retention window —
        never immediately on swap: a concurrent reader that resolved META
        before the swap may execute its lazy plan against the old state
        after it. Superseded-but-young states survive until a later
        refresh's GC pass (the vacuum pattern, applied to rollup state)."""
        import time as _t

        if not self.state_dir.exists():
            return 0
        cutoff = _t.time() - self.state_retention_s
        removed = 0
        for d in self.state_dir.iterdir():
            rel = f"state/{d.name}"
            if rel != keep and d.is_dir() and d.stat().st_mtime <= cutoff:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
        return removed

    # -- reads -------------------------------------------------------------

    def read(self, *, partials: bool = False) -> DataFrame:
        """The materialized rollup (avg derived from exact partials).

        ``partials=True`` additionally exposes the exact decimal ``vsum``
        partial — the decomposable state itself — for callers that need to
        merge further (coarser re-rollups, cross-engine fingerprints)
        without reintroducing float division."""
        meta = self._meta()
        if meta["state"] is None:
            raise ValueError("rollup has never been refreshed — call refresh() first")
        df = self.spark.read.parquet(str(self.root / meta["state"]))
        cols = [
            F.col("series_id"),
            F.col("bucket"),
            F.col("n"),
            F.col("vmin"),
            F.col("vmax"),
            F.round((F.col("vsum") / F.col("n")).cast("double"), 6).alias("vavg"),
        ]
        if partials:
            cols.insert(3, F.col("vsum"))
        return df.select(*cols)

    def refreshed_version(self) -> int:
        return self._meta()["refreshed_version"]


# ---------------------------------------------------------------------------
# Bitemporal-aware continuous aggregate: latest-collapse INSIDE the refresh
# ---------------------------------------------------------------------------


def _latest_hourly(df: DataFrame) -> DataFrame:
    """Per-(series, hour) aggregate of the LATEST revision per (series,
    valid_time) — the bitemporal rollup's unit of state. ``n`` counts valid
    times (latest rows), not revisions."""
    from timedb_spark.operators.bitemporal import latest

    return latest(df).groupBy(
        "series_id", F.date_trunc("hour", "valid_time").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DSUM)).alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


class BitemporalContinuousAggregate(ContinuousAggregate):
    """Continuous aggregate whose state reflects the LATEST revision per
    (series_id, valid_time) — the bitemporal-aware variant VERDICT r9 task
    #7 names (latest-collapse INSIDE the incremental refresh).

    Why the plain partial-merge is wrong here: a restating commit (a new
    revision for an already-aggregated valid_time) must REPLACE the old
    revision's contribution, and a backfill (an older-knowledge revision
    landing late) must lose to the stored winner — neither is expressible
    as a decomposable merge of per-commit partials (count/sum would double
    by revision). The TimescaleDB continuous-aggregate answer is an
    invalidation log; the manifest diff IS that log here: the refresh reads
    ONLY the newly committed files, derives the affected (series, bucket)
    keys, re-collapses exactly those buckets from the store's current file
    set (partition-pruned to the affected vt_months, so revisions of a
    valid_time — which always share its vt_month partition — are all
    seen), and swaps them into the carried state with a broadcast
    anti-join. Scan cost per refresh: the new files + the affected months'
    partitions, never the table; at 100 TB with a daily cadence that is
    the day's partition plus whatever months restatements actually touch.
    Removed files (delete_series / TTL / vacuum-after-rewrite commits)
    still force the full-recompute fallback, exactly like the base class.

    Stats contract: ``refresh()`` reports ``buckets_recomputed`` on the
    noop (0) and incremental (= the commit's distinct affected-key count)
    paths only; the full-recompute path OMITS the key — every bucket is
    rebuilt there, so a count would just restate the state size.

    Broadcast discipline: the affected-key set is broadcast into the
    semi/anti invalidation joins only while ``n_affected`` stays under
    ``broadcast_key_limit``. A restatement-heavy or full-day commit over
    ~1M series can carry tens of millions of (series, hour) keys — past
    any sane broadcast budget — so above the limit the hint is dropped
    and AQE picks the join strategy (a shuffled semi/anti join, which is
    exactly right at that width).
    """

    #: max distinct (series_id, bucket) keys the invalidation joins will
    #: force-broadcast; ~50 B/key puts 200k keys ≈ 10 MB (Spark's default
    #: autoBroadcastJoinThreshold). Beyond this, AQE decides.
    broadcast_key_limit: int = 200_000

    def __init__(self, store: SnapshotStore, name: str = "hourly_bt", state_retention_s: float = 600.0):
        super().__init__(store, name=name, state_retention_s=state_retention_s)

    def _noop_extra(self) -> dict:
        return {"buckets_recomputed": 0}

    def _compute_merged(self, meta, cur_v, cur_files, new_files, removed):
        base = str(self.store.values_path)
        if meta["state"] is not None and not removed:
            if not new_files:
                return (
                    self.spark.read.parquet(str(self.root / meta["state"])),
                    "incremental", 0, {"buckets_recomputed": 0},
                )
            delta = self.spark.read.option("basePath", base).parquet(
                *[f"{base}/{f}" for f in new_files]
            )
            affected = (
                delta.select(
                    "series_id", F.date_trunc("hour", "valid_time").alias("bucket")
                ).distinct().localCheckpoint(eager=True)  # pin: later reads race the state swap
            )
            n_affected = affected.count()
            # Every revision of a valid_time lives in its vt_month
            # partition, so pruning the re-collapse scan to the affected
            # months is sound AND bounded by what the new commit actually
            # touched (a bounded-month collect, not a row collect). The
            # scan pins version=cur_v — the SAME manifest the preamble
            # resolved — so a concurrent append committing between _load
            # and this read cannot leak post-cur_v revisions into a state
            # that records refreshed_version=cur_v.
            months = [
                r["m"]
                for r in affected.select(
                    F.date_format("bucket", "yyyyMM").alias("m")
                ).distinct().collect()
            ]
            scope = self.store.read_values(version=cur_v).filter(F.col("vt_month").isin(months))
            # Only force the broadcast while the key set is provably small;
            # a wide commit's key set goes through AQE-planned shuffled
            # semi/anti joins instead (see class docstring).
            inval = (
                F.broadcast(affected)
                if n_affected <= self.broadcast_key_limit
                else affected
            )
            recomputed = _latest_hourly(
                scope.join(
                    inval,
                    on=[
                        scope.series_id == inval.series_id,
                        F.date_trunc("hour", scope.valid_time) == inval.bucket,
                    ],
                    how="leftsemi",
                )
            )
            prev = self.spark.read.parquet(str(self.root / meta["state"]))
            kept = prev.join(inval, ["series_id", "bucket"], "left_anti")
            return (
                kept.unionByName(recomputed),
                "incremental", len(new_files), {"buckets_recomputed": n_affected},
            )
        if cur_files:
            merged = _latest_hourly(
                self.spark.read.option("basePath", base).parquet(
                    *[f"{base}/{f}" for f in cur_files]
                )
            )
        else:
            merged = _latest_hourly(self.store.read_values(version=cur_v))
        # Full recompute rebuilds every bucket — a count would restate the
        # state size, so the key is omitted (stats contract in docstring).
        return merged, "full", len(cur_files), {}
