"""SnapshotStore: atomic multi-file commits, optimistic concurrency,
snapshot isolation, time travel, vacuum (timedb_spark/snapstore.py).

Stronger guarantees than the reference's sessionless parallel inserts
(ref tests/test_write_concurrency.py): whole batches become visible
atomically, and rewrite ops never disturb pinned readers.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timedb_spark.client import TimeDB
from timedb_spark.snapstore import SnapshotStore

UTC = timezone.utc


def _batch(series: int, month: int, n: int = 3, base: float = 0.0) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "series_id": [series] * n,
            "valid_time": pd.to_datetime([datetime(2024, month, d + 1, tzinfo=UTC) for d in range(n)]),
            "value": [base + d for d in range(n)],
        }
    )


@pytest.fixture()
def db(spark, tmp_path):
    d = TimeDB(spark, str(tmp_path / "snap"), table_format="snapshot")
    d.create()
    yield d
    d.delete()


def test_roundtrip_and_version_history(db):
    db.write(_batch(1, 1), retention="short")
    db.write(_batch(2, 2), retention="long")
    assert db.read(series_ids=[1, 2]).count() == 6
    vs = db.store.versions()
    assert [v["op"] for v in vs] == ["create", "append", "append"]
    assert vs[-1]["n_files"] > vs[1]["n_files"]


def test_unmanifested_files_are_invisible(db, spark):
    """A file that lands in the dataset directory WITHOUT a manifest commit
    (crashed writer) must not be readable — the atomicity property."""
    db.write(_batch(1, 1), retention="short")
    before = db.store.read_values().count()
    # simulate a crashed writer: copy a real data file to a new name
    part = next(db.store.values_path.glob("retention=*/vt_month=*"))
    src = next(part.glob("*.parquet"))
    orphan = part / "orphan-crashed-writer.parquet"
    orphan.write_bytes(src.read_bytes())
    assert db.store.read_values().count() == before  # invisible
    assert db.store.partition_stats()[0]["n_files"] == 1  # stats ignore it too


def test_time_travel_reads_old_versions(db):
    db.write(_batch(1, 1, base=0.0), retention="short")
    v1 = db.store.versions()[-1]["version"]
    db.write(_batch(1, 1, base=100.0), retention="short")
    latest = db.store.read_values()
    pinned = db.store.read_values(version=v1)
    assert latest.count() == 6 and pinned.count() == 3
    assert pinned.agg(F.max("value")).collect()[0][0] < 100


def test_concurrent_writers_lose_nothing(spark, tmp_path):
    """8 parallel writers: every batch's rows present, version chain is
    contiguous (each commit won exactly one version)."""
    db = TimeDB(spark, str(tmp_path / "conc"), table_format="snapshot")
    db.create()

    def w(i: int):
        db.write(_batch(i, 1 + i % 3, base=float(i)), retention="short")

    with ThreadPoolExecutor(8) as ex:
        list(ex.map(w, range(8)))
    out = db.read(series_ids=list(range(8)))
    assert out.count() == 24
    assert {r.series_id for r in out.select("series_id").distinct().collect()} == set(range(8))
    versions = [v["version"] for v in db.store.versions()]
    assert versions == list(range(1, 10))  # create + 8 appends, no gaps
    db.delete()


def test_snapshot_isolation_under_delete_and_compact(db):
    for i in range(3):
        db.write(_batch(1, 1, base=10.0 * i), retention="short")
    db.write(_batch(2, 1), retention="short")
    v_before = db.store.versions()[-1]["version"]

    assert db.store.delete_series([1]) != []
    assert db.store.compact(max_files_per_partition=0) != []

    # latest: series 1 gone, compacted
    latest = db.store.read_values()
    assert latest.filter(F.col("series_id") == 1).count() == 0
    assert latest.count() == 3
    # pinned reader still sees the pre-delete world, consistently
    pinned = db.store.read_values(version=v_before)
    assert pinned.filter(F.col("series_id") == 1).count() == 9
    assert pinned.count() == 12
    ops = [v["op"] for v in db.store.versions()]
    assert ops[-2:] == ["delete_series", "compact"]


def test_ttl_is_a_manifest_swap_then_vacuum_reclaims(db):
    db.write(_batch(1, 1), retention="short")  # Jan 2024 + 180d TTL << now
    db.write(_batch(2, 6), retention="forever")
    v_before = db.store.versions()[-1]["version"]
    dropped = db.store.apply_retention(now=datetime(2026, 1, 1, tzinfo=UTC))
    assert dropped and "retention=short" in dropped[0]
    assert db.store.read_values().count() == 3  # forever rows only
    # old version still reads the expired rows (files not yet deleted)
    assert db.store.read_values(version=v_before).count() == 6

    n_files_before = sum(1 for _ in db.store.values_path.rglob("*.parquet"))
    # default grace window protects young DATA files (they could belong to
    # an in-flight commit): history truncates but no file is deleted
    assert db.store.vacuum(keep_last=1)["removed_files"] == 0
    assert sum(1 for _ in db.store.values_path.rglob("*.parquet")) == n_files_before
    stats = db.store.vacuum(keep_last=1, min_age_s=0)
    assert stats["removed_files"] > 0
    assert sum(1 for _ in db.store.values_path.rglob("*.parquet")) < n_files_before
    assert db.store.read_values().count() == 3  # latest unaffected
    with pytest.raises(ValueError, match="vacuum"):
        db.store.read_values(version=v_before)


def test_client_surface_unchanged_on_snapshot_format(db):
    """The full client surface (write/skip_unchanged/read/read_relative/
    fast_count) runs unchanged over the snapshot store."""
    db.write(_batch(1, 1), retention="short")
    r = db.write(_batch(1, 1), retention="short", skip_unchanged=True)
    assert (r.written, r.skipped) == (0, 3)
    assert db.read(series_ids=[1]).count() == 3
    assert db.count(retention="short") == 3
    assert isinstance(db.store, SnapshotStore)


def test_txn_commit_is_idempotent(db, spark):
    """The same (app_id, batch_id) pair commits at most once — a replayed
    micro-batch changes neither versions nor rows."""
    db.write(_batch(1, 1), retention="short")  # normal write for comparison
    v0 = db.store.versions()[-1]["version"]

    stamped = db.store.read_values().drop("vt_month")  # already-stamped rows
    db.store.append_values(stamped, txn=("app", 7))
    v1 = db.store.versions()[-1]["version"]
    assert v1 == v0 + 1
    n1 = db.store.read_values().count()

    db.store.append_values(stamped, txn=("app", 7))  # replay: must be a no-op
    assert db.store.versions()[-1]["version"] == v1
    assert db.store.read_values().count() == n1

    db.store.append_values(stamped, txn=("app", 8))  # next batch commits
    assert db.store.versions()[-1]["version"] == v1 + 1


def test_streaming_ingest_exactly_once(spark, tmp_path):
    """availableNow stream → foreachBatch txn commits: all rows land, one
    append version per micro-batch; a RESTART from the same checkpoint (no
    new data) re-commits nothing; a forced replay of a committed batch id is
    deduped by the store."""
    from timedb_spark.streaming import stream_append_to_store

    db = TimeDB(spark, str(tmp_path / "ing"), table_format="snapshot")
    db.create()
    # a stamped series_values landing zone, 3 files -> 3 micro-batches
    seed = TimeDB(spark, str(tmp_path / "seed"), table_format="snapshot")
    seed.create()
    for i in range(3):
        seed.write(_batch(i, 1 + i), retention="short")
    sv = seed.store.read_values().drop("vt_month")
    land = str(tmp_path / "land")
    sv.repartition(3).write.parquet(land)

    stream = spark.readStream.schema(sv.schema).option("maxFilesPerTrigger", 1).parquet(land)
    ckpt = str(tmp_path / "ckpt")
    n = stream_append_to_store(stream, db.store, checkpoint_dir=ckpt)
    assert n >= 3
    assert db.store.read_values().count() == 9
    ops = [v["op"] for v in db.store.versions()]
    assert ops.count("append") == n  # one atomic commit per batch

    # restart from the same checkpoint: no new input -> nothing commits
    stream2 = spark.readStream.schema(sv.schema).option("maxFilesPerTrigger", 1).parquet(land)
    n2 = stream_append_to_store(stream2, db.store, checkpoint_dir=ckpt)
    assert db.store.read_values().count() == 9
    # forced replay of batch 0 (same app_id): deduped by the txn marker
    db.store.append_values(sv.limit(3), txn=("timedb-ingest", 0))
    assert db.store.read_values().count() == 9
    seed.delete()
    db.delete()


def test_append_rejects_schema_drift(db, spark):
    """A frame with a retyped column must fail loudly at append, never mix
    schemas into the dataset."""
    db.write(_batch(1, 1), retention="short")
    good = db.store.read_values().drop("vt_month")
    drifted = good.withColumn("value", F.col("value").cast("string"))
    with pytest.raises(ValueError, match="schema drift"):
        db.store.append_values(drifted)
    assert db.store.read_values().count() == 3  # nothing landed


def test_txn_crash_between_values_and_run_series_loses_nothing(db):
    """Exactly-once contract under a crash INSIDE the write: run_series must
    land before the txn-marked values commit, because the txn marker makes a
    replay a whole-write no-op. If the values commit carried the marker
    first (the old order), a crash before run_series permanently lost the
    batch's run_series mappings — every replay saw 'already committed' and
    skipped the whole write."""
    batch = _batch(5, 3).assign(run_id=777)

    # simulate a crash AFTER run_series lands but BEFORE the values commit
    real_append_values = db.store.append_values
    calls = {"n": 0}

    def crashing_append_values(df, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before values commit")
        return real_append_values(df, **kw)

    db.store.append_values = crashing_append_values
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            db.write(batch, retention="short", txn=("app", 42))
        # replay of the same (app_id, batch_id): must complete the write
        res = db.write(batch, retention="short", txn=("app", 42))
        assert res.written == 3
        # a second replay is now a whole-write no-op
        res2 = db.write(batch, retention="short", txn=("app", 42))
        assert res2.written == 0 and res2.skipped == 0
    finally:
        db.store.append_values = real_append_values

    # nothing lost: values landed exactly once, run_series mapping present
    assert db.read(series_ids=[5]).count() == 3
    assert db.read_run_series(series_id=5) == [777]


def test_delete_series_rescans_after_lost_occ_race(db, spark):
    """delete_series serializing AFTER a concurrent append must erase the
    appended rows too: the commit is pinned to the scanned file list
    (base_version), a lost race raises CommitConflict, and the op redoes
    the scan/rewrite against the winner's manifest — never a blind
    add/remove merge that lets the winner's files (containing the erased
    series) survive."""
    from timedb_spark.snapstore import SnapshotStore

    db.write(_batch(1, 1), retention="short")
    db.write(_batch(2, 1), retention="short")
    store = db.store
    real_commit = SnapshotStore._commit
    state = {"injected": False}

    def racy_commit(self, **kw):
        if kw.get("op") == "delete_series" and not state["injected"]:
            state["injected"] = True
            # concurrent writer wins the race with MORE rows of series 1
            db.write(_batch(1, 2, base=100.0), retention="short")
        return real_commit(self, **kw)

    store._commit = racy_commit.__get__(store)
    try:
        store.delete_series([1])
    finally:
        store.__dict__.pop("_commit", None)

    assert state["injected"]  # the race actually happened
    assert db.read(series_ids=[1]).count() == 0  # including the racer's rows
    assert db.read(series_ids=[2]).count() == 3  # bystander untouched
