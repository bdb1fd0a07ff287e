"""ContinuousAggregate: incremental manifest-diff refresh of the hourly
rollup (timedb_spark/rollup.py) — correctness vs full recompute, bounded
incremental scans, full-recompute fallback on deletes."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timedb_spark.client import TimeDB
from timedb_spark.rollup import ContinuousAggregate, _hourly_partial

UTC = timezone.utc


def _batch(series: int, day: int, hours=(0, 0, 1), base: float = 1.0) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "series_id": [series] * len(hours),
            "valid_time": pd.to_datetime(
                [datetime(2024, 1, day, h, 30, tzinfo=UTC) for h in hours]
            ),
            "value": [base + i for i in range(len(hours))],
        }
    )


@pytest.fixture()
def db(spark, tmp_path):
    d = TimeDB(spark, str(tmp_path / "ca"), table_format="snapshot")
    d.create()
    yield d
    d.delete()


def _expect(db):
    """Full recompute straight off the store — the refresh oracle."""
    rows = (
        _hourly_partial(db.store.read_values())
        .select(
            "series_id",
            "bucket",
            "n",
            "vmin",
            "vmax",
            F.round((F.col("vsum") / F.col("n")).cast("double"), 6).alias("vavg"),
        )
        .collect()
    )
    return sorted((r.series_id, r.bucket, r.n, r.vmin, r.vmax, r.vavg) for r in rows)


def _got(ca):
    return sorted(
        (r.series_id, r.bucket, r.n, r.vmin, r.vmax, r.vavg) for r in ca.read().collect()
    )


def test_incremental_refresh_matches_full_recompute(db):
    ca = ContinuousAggregate(db.store)
    db.write(_batch(1, 1), retention="short")
    r1 = ca.refresh()
    assert r1["mode"] == "full"  # first refresh materializes
    assert _got(ca) == _expect(db)

    db.write(_batch(1, 1, hours=(0, 2), base=10.0), retention="short")  # overlaps hour 0
    db.write(_batch(2, 3), retention="short")
    r2 = ca.refresh()
    assert r2["mode"] == "incremental"
    assert _got(ca) == _expect(db)
    # merged bucket: hour-0 of series 1 now counts rows from both batches
    merged = [t for t in _got(ca) if t[0] == 1 and t[1].hour == 0]
    assert merged and merged[0][2] == 3  # 2 rows batch1-hour0 + 1 row batch2


def test_incremental_scan_is_bounded_by_new_commits(db):
    ca = ContinuousAggregate(db.store)
    for day in (1, 2, 3, 4):
        db.write(_batch(1, day), retention="short")
    ca.refresh()
    n_total_files = len(db.store._load()[1])
    db.write(_batch(1, 5), retention="short")
    r = ca.refresh()
    assert r["mode"] == "incremental"
    assert 0 < r["files_scanned"] < n_total_files  # only the new commit's files
    assert _got(ca) == _expect(db)
    assert ca.refresh()["mode"] == "noop"


def test_delete_triggers_full_recompute_and_stays_correct(db):
    ca = ContinuousAggregate(db.store)
    db.write(_batch(1, 1), retention="short")
    db.write(_batch(2, 1), retention="short")
    ca.refresh()
    db.store.delete_series([1])
    r = ca.refresh()
    assert r["mode"] == "full"  # removed files → decomposable merge can't subtract
    assert _got(ca) == _expect(db)
    assert all(t[0] != 1 for t in _got(ca))


def test_rollup_composes_with_streaming_ingest(spark, tmp_path):
    """End-to-end: micro-batches committed by the exactly-once streaming
    sink are ordinary append commits, so the rollup refreshes INCREMENTALLY
    over them and matches the full recompute."""
    from timedb_spark.streaming import stream_append_to_store

    db = TimeDB(spark, str(tmp_path / "sri"), table_format="snapshot")
    db.create()
    seed = TimeDB(spark, str(tmp_path / "seed2"), table_format="snapshot")
    seed.create()
    for i in range(3):
        seed.write(_batch(i, 1 + i), retention="short")
    sv = seed.store.read_values().drop("vt_month")
    land = str(tmp_path / "land2")
    sv.repartition(3).write.parquet(land)

    ca = ContinuousAggregate(db.store)
    db.write(_batch(9, 6), retention="short")  # pre-stream content
    assert ca.refresh()["mode"] == "full"

    stream = spark.readStream.schema(sv.schema).option("maxFilesPerTrigger", 1).parquet(land)
    stream_append_to_store(stream, db.store, checkpoint_dir=str(tmp_path / "ck2"))
    r = ca.refresh()
    assert r["mode"] == "incremental"
    assert _got(ca) == _expect(db)
    seed.delete()
    db.delete()


def test_pinned_reader_survives_refresh_and_aged_states_gc(db):
    """A reader holding the lazy DataFrame from read() (resolved against the
    previous META) must still execute after a refresh swaps the state — the
    old state dir is retained for state_retention_s, not deleted on swap.
    Aged-out superseded states ARE collected by a later refresh's GC."""
    db.write(_batch(1, 1))
    ca = ContinuousAggregate(db.store)  # default 600s retention window
    ca.refresh()
    pinned = ca.read()  # lazy plan against the v1 state files

    db.write(_batch(2, 2))
    ca.refresh()  # swap: v1 state superseded but young -> kept on disk
    assert pinned.count() == 2  # executes AFTER the swap, against old state
    assert len(list(ca.state_dir.iterdir())) == 2

    # age the window out: superseded states vanish, current one survives
    ca.state_retention_s = 0.0
    db.write(_batch(3, 3))
    ca.refresh()
    import json

    cur = json.loads(ca.meta_path.read_text())["state"]
    left = [d.name for d in ca.state_dir.iterdir()]
    assert left == [cur.split("/", 1)[1]]
    assert _got(ca) == _expect(db)


# ---------------------------------------------------------------------------
# BitemporalContinuousAggregate: latest-collapse inside the refresh
# ---------------------------------------------------------------------------


def _bt_got(ca):
    return sorted(
        (r.series_id, r.bucket, r.n, r.vmin, r.vmax, r.vavg) for r in ca.read().collect()
    )


def test_bitemporal_refresh_replaces_restated_buckets(db, spark):
    """A restating commit (newer knowledge for an aggregated valid_time)
    must REPLACE the stored winner — n stays the count of valid times, and
    the value flips to the new revision. The plain partial merge would
    report n=2 and keep the old value in vmin."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="bt")
    db.write(_batch(1, 1, hours=(0,), base=10.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    r1 = ca.refresh()
    assert r1["mode"] == "full"
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 10.0, 10.0, 10.0)]

    db.write(_batch(1, 1, hours=(0,), base=99.0), knowledge_time=datetime(2024, 1, 1, 7, tzinfo=UTC))
    r2 = ca.refresh()
    assert r2["mode"] == "incremental"
    assert r2["buckets_recomputed"] == 1
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 99.0, 99.0, 99.0)]


def test_bitemporal_backfill_loses_to_stored_winner(db):
    """A late-arriving OLDER-knowledge revision must not displace the
    stored winner — the re-collapse sees all revisions of the bucket and
    max_by keeps the newest knowledge."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="bt")
    db.write(_batch(1, 1, hours=(0,), base=99.0), knowledge_time=datetime(2024, 1, 1, 7, tzinfo=UTC))
    ca.refresh()
    db.write(_batch(1, 1, hours=(0,), base=5.0), knowledge_time=datetime(2024, 1, 1, 2, tzinfo=UTC))
    r2 = ca.refresh()
    assert r2["mode"] == "incremental"
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 99.0, 99.0, 99.0)]


def test_bitemporal_invalidation_scope_is_bounded(db):
    """Only the buckets the new commit touches are recomputed; untouched
    buckets carry over from the previous state unchanged."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="bt")
    db.write(_batch(1, 1, hours=(0, 1), base=10.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    db.write(_batch(2, 2, hours=(3,), base=20.0), knowledge_time=datetime(2024, 1, 2, 6, tzinfo=UTC))
    ca.refresh()
    db.write(_batch(1, 1, hours=(1,), base=50.0), knowledge_time=datetime(2024, 1, 1, 8, tzinfo=UTC))
    r = ca.refresh()
    assert r["mode"] == "incremental"
    assert r["buckets_recomputed"] == 1
    assert _bt_got(ca) == [
        (1, datetime(2024, 1, 1, 0), 1, 10.0, 10.0, 10.0),
        (1, datetime(2024, 1, 1, 1), 1, 50.0, 50.0, 50.0),
        (2, datetime(2024, 1, 2, 3), 1, 20.0, 20.0, 20.0),
    ]


def test_bitemporal_delete_falls_back_to_full(db):
    """Removed files (delete_series rewrite) can't be handled by
    invalidation — the refresh detects them in the manifest diff and
    recomputes from scratch, like the base class."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="bt")
    db.write(_batch(1, 1, hours=(0,), base=10.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    db.write(_batch(2, 1, hours=(0,), base=20.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    ca.refresh()
    db.store.delete_series([2])
    r = ca.refresh()
    assert r["mode"] == "full"
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 10.0, 10.0, 10.0)]


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_bitemporal_rollup_random_commit_splits_match_direct(db, seed):
    """Property: however a revision history is split across commits, the
    incrementally refreshed bitemporal state must equal a direct
    latest-collapse recompute of the whole store. Randomized revision
    shapes (ties on (sid, vt), interleaved knowledge order, restatements
    and backfills in every commit) with deterministic seeds."""
    import random

    from timedb_spark.rollup import BitemporalContinuousAggregate, _latest_hourly

    rng = random.Random(seed)
    kt_minutes = rng.sample(range(1440), 30)  # collision-free: a (kt, ct)
    # tie between different values would make the winner partition-order
    # dependent in BOTH engines — not the property under test
    rows = [
        {
            "series_id": rng.randint(1, 3),
            "valid_time": datetime(2024, 1, rng.randint(1, 3), rng.randint(0, 3), 30, tzinfo=UTC),
            "knowledge_time": datetime(2024, 1, 4, tzinfo=UTC) + pd.Timedelta(minutes=kt_minutes[i]),
            "value": float(rng.randint(-50, 50)),
        }
        for i in range(30)
    ]
    commits = [[], [], []]
    for r in rows:
        commits[rng.randint(0, 2)].append(r)

    ca = BitemporalContinuousAggregate(db.store, name=f"prop{seed}")
    modes = []
    for batch in commits:
        if not batch:
            continue
        db.write(pd.DataFrame(batch))
        modes.append(ca.refresh()["mode"])
    assert modes[0] == "full" and all(m == "incremental" for m in modes[1:])

    def key(r):
        return (r.series_id, r.bucket, r.n, str(r.vsum), r.vmin, r.vmax)

    got = sorted(key(r) for r in ca.read(partials=True)
                 .select("series_id", "bucket", "n", "vsum", "vmin", "vmax").collect())
    want = sorted(key(r) for r in _latest_hourly(db.store.read_values()).collect())
    assert got == want


def test_bitemporal_refresh_pins_version_against_concurrent_append(db, monkeypatch):
    """Regression (r10 review): the incremental re-collapse must scan the
    SAME manifest version the refresh preamble pinned. A concurrent append
    landing between `_load` and the scoped scan (injected here on the
    refresh's first `read_values` call) must NOT leak into the state that
    records the pre-append `refreshed_version`; the NEXT refresh picks it
    up instead. Before the fix, the scan resolved the latest manifest and
    the injected restatement flipped the bucket a version early."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="race")
    db.write(_batch(1, 1, hours=(0,), base=10.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    assert ca.refresh()["mode"] == "full"
    db.write(_batch(1, 1, hours=(1,), base=20.0), knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))

    orig_read_values = db.store.read_values
    injected = {"done": False}

    def racing_read_values(version=None):
        if not injected["done"]:
            injected["done"] = True
            # the concurrent writer: restates hour 0 with newer knowledge
            db.write(_batch(1, 1, hours=(0,), base=99.0),
                     knowledge_time=datetime(2024, 1, 1, 9, tzinfo=UTC))
        return orig_read_values(version=version)

    monkeypatch.setattr(db.store, "read_values", racing_read_values)
    r = ca.refresh()
    monkeypatch.setattr(db.store, "read_values", orig_read_values)
    assert r["mode"] == "incremental" and injected["done"]
    # the pinned-version state must still show hour 0 = 10.0 (pre-append)
    got = {(x.series_id, x.bucket): x.vavg for x in ca.read().collect()}
    assert got[(1, datetime(2024, 1, 1, 0))] == 10.0
    assert got[(1, datetime(2024, 1, 1, 1))] == 20.0
    # the follow-up refresh folds the concurrent commit in
    r2 = ca.refresh()
    assert r2["mode"] == "incremental" and r2["buckets_recomputed"] == 1
    got2 = {(x.series_id, x.bucket): x.vavg for x in ca.read().collect()}
    assert got2[(1, datetime(2024, 1, 1, 0))] == 99.0


def test_bitemporal_wide_commit_takes_shuffled_invalidation_path(db, monkeypatch):
    """ADVICE r10: the affected-key set is only force-broadcast while it is
    provably small. A commit wider than ``broadcast_key_limit`` (limit
    pinned to 1 here) must refresh through the AQE-planned shuffled
    semi/anti joins and still produce exactly the direct-recompute state —
    at 100 TB a full-day commit over ~1M series carries tens of millions
    of (series, hour) keys, past any sane broadcast budget. The hint drop
    is pinned directly (reviewer finding): a counting wrapper around
    F.broadcast sees ZERO calls during the wide refresh — result equality
    alone would also pass on the broadcast path — and the narrow control
    commit afterwards broadcasts again under the same counter."""
    import pyspark.sql.functions as SF

    from timedb_spark.rollup import BitemporalContinuousAggregate, _latest_hourly

    ca = BitemporalContinuousAggregate(db.store, name="wide")
    ca.broadcast_key_limit = 1
    db.write(_batch(1, 1, hours=(0, 1, 2), base=10.0),
             knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    assert ca.refresh()["mode"] == "full"
    # wide commit: 2 series × 3 hours = 6 affected keys (> limit), one of
    # them a restatement so the replace semantics ride the shuffled path
    db.write(_batch(1, 1, hours=(0, 3, 4), base=99.0),
             knowledge_time=datetime(2024, 1, 1, 8, tzinfo=UTC))
    db.write(_batch(2, 1, hours=(0, 1, 2), base=20.0),
             knowledge_time=datetime(2024, 1, 1, 8, tzinfo=UTC))
    calls = {"n": 0}
    orig_broadcast = SF.broadcast

    def counting_broadcast(frame):
        calls["n"] += 1
        return orig_broadcast(frame)

    # the fixture restores the module attr at teardown wherever a failure
    # lands (same idiom as the version-pin test above)
    monkeypatch.setattr(SF, "broadcast", counting_broadcast)
    r = ca.refresh()
    monkeypatch.setattr(SF, "broadcast", orig_broadcast)
    assert r["mode"] == "incremental" and r["buckets_recomputed"] == 6
    assert calls["n"] == 0, "wide commit still forced the broadcast hint"

    def key(r):
        return (r.series_id, r.bucket, r.n, str(r.vsum), r.vmin, r.vmax)

    got = sorted(key(x) for x in ca.read(partials=True)
                 .select("series_id", "bucket", "n", "vsum", "vmin", "vmax").collect())
    want = sorted(key(x) for x in _latest_hourly(db.store.read_values()).collect())
    assert got == want
    # and the restated bucket flipped to the newer-knowledge revision
    avg = {(x.series_id, x.bucket): x.vavg for x in ca.read().collect()}
    assert avg[(1, datetime(2024, 1, 1, 0))] == 99.0
    # control: a narrow commit under a sane limit broadcasts again — the
    # counter genuinely observes the invalidation joins, so the zero above
    # means "hint dropped", not "wrapper never engaged"
    ca.broadcast_key_limit = 200_000
    db.write(_batch(1, 1, hours=(5,), base=1.0),
             knowledge_time=datetime(2024, 1, 1, 9, tzinfo=UTC))
    monkeypatch.setattr(SF, "broadcast", counting_broadcast)
    r2 = ca.refresh()
    monkeypatch.setattr(SF, "broadcast", orig_broadcast)
    assert r2["mode"] == "incremental" and calls["n"] > 0


def test_bitemporal_full_recompute_omits_buckets_recomputed(db):
    """ADVICE r10: the full path's stats no longer carry the -1 sentinel —
    the key is present on noop (0) and incremental (= affected count)
    refreshes only."""
    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="stats")
    db.write(_batch(1, 1, hours=(0,), base=10.0),
             knowledge_time=datetime(2024, 1, 1, 6, tzinfo=UTC))
    r_full = ca.refresh()
    assert r_full["mode"] == "full" and "buckets_recomputed" not in r_full
    r_noop = ca.refresh()
    assert r_noop["mode"] == "noop" and r_noop["buckets_recomputed"] == 0


def test_bitemporal_ttl_sweep_exposes_older_surviving_winner(db):
    """The r11 gate composition's load-bearing semantic (VERDICT r10 task
    #5b): a TTL sweep that removes the NEWER-knowledge revision's partition
    must hand the win back to an older SURVIVING revision of the same
    (series, valid_time) — the post-sweep refresh is a full re-collapse of
    survivors (removed files in the manifest diff), never a filter of the
    pre state. Pinned here with an expired 'short' winner over a 'forever'
    loser; the oracle-side twin lives in __spark_entry__'s
    rollup_retention_refresh SQL."""
    from datetime import datetime as dt

    from timedb_spark.rollup import BitemporalContinuousAggregate

    ca = BitemporalContinuousAggregate(db.store, name="ttlwin")
    # older knowledge, surviving tier
    db.write(_batch(1, 1, hours=(0,), base=10.0), retention="forever",
             knowledge_time=dt(2024, 1, 1, 2, tzinfo=UTC))
    assert ca.refresh()["mode"] == "full"
    # newer knowledge restates the same valid_time in the short tier —
    # incremental invalidation flips the bucket to 99.0
    db.write(_batch(1, 1, hours=(0,), base=99.0), retention="short",
             knowledge_time=dt(2024, 1, 1, 9, tzinfo=UTC))
    r2 = ca.refresh()
    assert r2["mode"] == "incremental" and r2["buckets_recomputed"] == 1
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 99.0, 99.0, 99.0)]
    # TTL at a "today" past short's 180d but inside forever: the 99.0
    # revision's partition drops, refresh falls back to full, and the
    # SURVIVING 10.0 revision wins again
    dropped = db.store.apply_retention(now=dt(2026, 6, 1, tzinfo=UTC))
    assert dropped, "sweep removed nothing — fixture dates drifted"
    r3 = ca.refresh()
    assert r3["mode"] == "full" and "buckets_recomputed" not in r3
    assert _bt_got(ca) == [(1, datetime(2024, 1, 1, 0), 1, 10.0, 10.0, 10.0)]


@pytest.mark.parametrize("seed", [11, 47])
def test_bitemporal_rollup_ttl_sweep_matches_survivor_recompute(db, seed):
    """Property (seeded): after random commits land under MIXED retention
    tiers (alternating short/forever) and the rollup refreshes after each,
    a TTL sweep at a pinned today (past short's 180 d, inside forever) must
    drive the next refresh through the removed-files FULL path and leave a
    state equal to a direct latest-collapse of the SURVIVORS — whatever
    revisions the sweep deleted, including cases where a short-tier winner
    drops and an older forever-tier revision takes the bucket back."""
    import random

    from timedb_spark.rollup import BitemporalContinuousAggregate, _latest_hourly

    rng = random.Random(seed)
    kt_minutes = rng.sample(range(1440), 24)
    rows = [
        {
            "series_id": rng.randint(1, 3),
            "valid_time": datetime(2024, 1, rng.randint(1, 3), rng.randint(0, 3), 30, tzinfo=UTC),
            "knowledge_time": datetime(2024, 1, 4, tzinfo=UTC) + pd.Timedelta(minutes=kt_minutes[i]),
            "value": float(rng.randint(-50, 50)),
        }
        for i in range(24)
    ]
    commits = [[], [], []]
    for r in rows:
        commits[rng.randint(0, 2)].append(r)

    ca = BitemporalContinuousAggregate(db.store, name=f"ttlprop{seed}")
    for i, batch in enumerate(commits):
        if not batch:
            continue
        db.write(pd.DataFrame(batch), retention="short" if i % 2 == 0 else "forever")
        ca.refresh()

    dropped = db.store.apply_retention(now=datetime(2026, 6, 1, tzinfo=UTC))
    assert dropped, "no short-tier partition expired — fixture dates drifted"
    r = ca.refresh()
    assert r["mode"] == "full" and "buckets_recomputed" not in r

    def key(x):
        return (x.series_id, x.bucket, x.n, str(x.vsum), x.vmin, x.vmax)

    got = sorted(key(x) for x in ca.read(partials=True)
                 .select("series_id", "bucket", "n", "vsum", "vmin", "vmax").collect())
    want = sorted(key(x) for x in _latest_hourly(db.store.read_values()).collect())
    assert got == want
