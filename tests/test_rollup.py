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
