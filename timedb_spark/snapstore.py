"""Manifest-based snapshot store: atomic multi-file commits, optimistic
concurrency, snapshot isolation, and time travel over the same partitioned
parquet layout as :class:`timedb_spark.store.Store`.

The v1 store publishes file-at-a-time (atomic per file, not per batch) and
readers list the directory — so a reader can observe half of an in-flight
batch, and compaction/delete briefly swap directories under readers. This
module adds the minimal table-format commit protocol that fixes all of it
(the locally-buildable core of what Delta/Iceberg provide):

- ``_manifests/v{N}.json`` — each version lists the COMPLETE set of data
  files in the table plus commit metadata. Readers resolve a manifest, then
  read exactly those files: a batch becomes visible all-at-once when its
  manifest lands, never file-by-file.
- **Commit = atomic manifest create** (``open(path, "x")``, O_EXCL). Two
  concurrent writers racing for version N+1: one wins, the loser reloads
  the new latest and retries on top — optimistic concurrency with no lock
  server. Appends always merge cleanly (file sets are disjoint); rewrite
  ops (compact/delete/TTL) recompute against the winner's file list before
  retrying.
- **Snapshot isolation + time travel** — old manifests keep referencing the
  old files, which rewrite ops never delete; ``read_values(version=K)`` is
  a consistent as-of-commit-K read even while compaction/deletes land.
  (The bitemporal model time-travels *data* via knowledge_time; this
  time-travels *storage* — both axes compose.)
- **Vacuum** — physically deletes files referenced only by expired
  versions, after truncating history. The only destructive step, and the
  only one that needs a retention window at 100 TB.

Scale posture: a manifest holds one line per data file — at 100 TB with
~1 GB files that's ~10^5 entries, a few MB of JSON read once per query
plan, same order as Delta's checkpoint files. O_EXCL-create is atomic on
POSIX/HDFS; on S3 swap in a conditional PUT (If-None-Match) — the protocol
is unchanged. Ref parity: the reference's sessionless parallel inserts
(timedb/tests/test_write_concurrency.py) get strictly stronger semantics
here (whole-batch atomicity instead of per-INSERT).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import date, datetime, timedelta, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timedb_spark.session import micros_parquet_writes

from timedb_spark.schema import RETENTION_TTL_DAYS, SERIES_VALUES_SCHEMA
from timedb_spark.store import _SORT_KEY, Store


class CommitConflict(Exception):
    """A rewrite op lost the OCC race: the file-list snapshot its rewrite
    was computed against is no longer the latest version. The op must redo
    its scan/rewrite against the new latest manifest — blindly merging
    add/remove on top of the winner would let a concurrently-appended file
    (which may contain rows the rewrite was supposed to erase or compact)
    survive untouched."""


class SnapshotStore(Store):
    """:class:`Store` with manifest-committed ``series_values``.

    ``run_series`` (a tiny dedup-on-read mapping) stays directory-based —
    its rows are idempotent upserts where partial visibility is harmless;
    the manifest protocol guards the big fact table.
    """

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark, root)
        self.manifest_dir = self.root / "_manifests"

    # -- manifest protocol -------------------------------------------------

    def _manifest_path(self, version: int) -> Path:
        return self.manifest_dir / f"v{version:012d}.json"

    def _versions(self) -> list[int]:
        if not self.manifest_dir.exists():
            return []
        return sorted(int(p.stem[1:]) for p in self.manifest_dir.glob("v*.json"))

    def _read_manifest(self, version: int) -> dict | None:
        """Read one manifest, tolerating a concurrent vacuum unlinking it
        between the caller's directory glob and this read (history
        truncation must be safe under live readers) — None means 'gone'."""
        try:
            return json.loads(self._manifest_path(version).read_text())
        except FileNotFoundError:
            return None

    def versions(self) -> list[dict]:
        """Commit history (oldest first): version, op, file/row counts."""
        out = []
        for v in self._versions():
            m = self._read_manifest(v)
            if m is None:
                continue  # vacuumed between glob and read
            out.append(
                {
                    "version": v,
                    "op": m["op"],
                    "n_files": len(m["files"]),
                    "committed_at": m["committed_at"],
                }
            )
        return out

    def _load(self, version: int | None = None) -> tuple[int, list[str]]:
        while True:
            vs = self._versions()
            if not vs:
                return 0, []
            v = max(vs) if version is None else version
            if v not in vs:
                raise ValueError(f"version {v} not found (have {vs[0]}..{vs[-1]}; older may be vacuumed)")
            m = self._read_manifest(v)
            if m is not None:
                return v, m["files"]
            if version is not None:
                # the pinned version was vacuumed out from under the reader
                raise ValueError(f"version {version} not found (vacuumed)")
            # latest vanished ⇒ a concurrent vacuum kept a newer one: re-glob

    def _txn_committed(self, txn: tuple[str, int]) -> bool:
        """Has (app_id, txn_version) already landed in any live manifest?"""
        app, ver = txn
        for v in self._versions():
            m = self._read_manifest(v)
            if m is None:
                continue  # vacuumed between glob and read
            t = m.get("txn")
            if t and t[0] == app and int(t[1]) == int(ver):
                return True
        return False

    def _commit(
        self,
        *,
        add: list[str],
        remove: set[str],
        op: str,
        txn: tuple[str, int] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Publish a new version via atomic manifest create; on a lost race,
        appends merge onto the winner's file list and retry (file sets are
        disjoint, so the merge is always correct), while rewrite ops pass
        ``base_version`` and get :class:`CommitConflict` instead — their
        add/remove was computed against that exact file list, and the
        winner's files may contain rows the rewrite should have covered.
        The caller redoes the scan/rewrite against the new latest.

        ``txn=(app_id, txn_version)`` makes the commit IDEMPOTENT: if any
        live manifest already carries the same pair, the commit is a no-op
        (returns the current version) — the Delta-style transactional-writer
        dedup that gives a replayed streaming micro-batch exactly-once
        semantics. The re-check runs inside the retry loop, so a writer that
        loses the race to its own earlier attempt cannot double-commit."""
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        while True:
            if txn is not None and self._txn_committed(txn):
                return self._load()[0]
            cur_v, cur_files = self._load()
            if base_version is not None and cur_v != base_version:
                raise CommitConflict(
                    f"{op}: base version {base_version} is stale (latest is {cur_v})"
                )
            files = [f for f in cur_files if f not in remove] + add
            m = {
                "version": cur_v + 1,
                "parent": cur_v,
                "op": op,
                "files": files,
                "committed_at": datetime.now(timezone.utc).isoformat(),
            }
            if txn is not None:
                m["txn"] = [txn[0], int(txn[1])]
            # Write the FULL content to a hidden temp file first, then claim
            # the version with an atomic hard link (fails if the destination
            # exists — same OCC arbitration as O_EXCL create). A direct
            # open(path, "x") + dump makes the manifest VISIBLE to readers'
            # globs before its bytes land: under load a concurrent reader
            # sees truncated JSON (observed as JSONDecodeError in the
            # parallel-writers test). link-from-complete-file closes that
            # window — readers only ever see whole manifests. The temp name
            # starts with '.' so _versions()' v*.json glob never matches it.
            # On an object store, swap the link for a conditional PUT.
            tmp = self.manifest_dir / f".tmp-{uuid.uuid4().hex}.json"
            tmp.write_text(json.dumps(m))
            try:
                os.link(tmp, self._manifest_path(cur_v + 1))
                return cur_v + 1
            except FileExistsError:
                continue  # another writer won this version — retry on top
            finally:
                tmp.unlink(missing_ok=True)

    # -- writes ------------------------------------------------------------

    def create(self) -> None:
        super().create()
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        if not self._versions():
            self._commit(add=[], remove=set(), op="create")

    def append_values(self, df: DataFrame, *, txn: tuple[str, int] | None = None) -> None:
        self._write_values(df.select([f.name for f in SERIES_VALUES_SCHEMA.fields]), txn=txn)

    def _write_values(self, df: DataFrame, txn: tuple[str, int] | None = None) -> None:
        """Stage → rename files into the dataset → ONE manifest commit.

        Files are invisible to readers until the manifest lands, so a batch
        spanning many partitions/files appears atomically (the v1 store's
        per-file renames can expose partial batches). With ``txn``, a replay
        of an already-committed batch stages files but commits nothing (the
        orphans are invisible and vacuum reclaims them)."""
        if txn is not None and self._txn_committed(txn):
            return  # replayed batch — skip even the staging work
        # schema drift guard: the table's column/type contract is pinned by
        # SERIES_VALUES_SCHEMA; a caller slipping through with renamed or
        # retyped columns must fail loudly here, not corrupt the dataset
        # with mixed-schema files readers discover much later.
        expected = {(f.name, f.dataType.simpleString()) for f in SERIES_VALUES_SCHEMA.fields}
        got = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
        if got != expected:
            raise ValueError(
                f"append schema drift: unexpected={sorted(got - expected)} missing={sorted(expected - got)}"
            )
        stage = self._stage_dir()
        with micros_parquet_writes(self.spark):
            (
                df.withColumn("vt_month", F.date_format("valid_time", "yyyyMM"))
                .repartition("retention", "vt_month")
                .sortWithinPartitions("retention", "vt_month", *_SORT_KEY)
                .write.partitionBy("retention", "vt_month")
                .mode("overwrite")
                .parquet(str(stage))
            )
        added: list[str] = []
        self.values_path.mkdir(parents=True, exist_ok=True)
        for src in sorted(stage.rglob("*.parquet")):
            rel = src.relative_to(stage)
            dest = self.values_path / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            os.replace(src, dest)
            added.append(str(rel))
        shutil.rmtree(stage, ignore_errors=True)
        if added:
            self._commit(add=added, remove=set(), op="append", txn=txn)

    # -- reads -------------------------------------------------------------

    def read_values(self, version: int | None = None) -> DataFrame:
        """Consistent snapshot read: exactly the files of one manifest.

        ``basePath`` keeps hive partition-column derivation (retention,
        vt_month) over the explicit file list, so pruning behaves exactly
        as in the v1 store."""
        _, files = self._load(version)
        read_schema = T.StructType(
            list(SERIES_VALUES_SCHEMA.fields) + [T.StructField("vt_month", T.StringType(), True)]
        )
        if not files:
            return self.spark.createDataFrame([], read_schema)
        paths = [str(self.values_path / f) for f in files]
        return (
            self.spark.read.schema(read_schema)
            .option("basePath", str(self.values_path))
            .parquet(*paths)
        )

    # -- rewrite ops: new version, old files untouched ----------------------

    def _partition_files(self, files: list[str]) -> dict[str, list[str]]:
        by_part: dict[str, list[str]] = {}
        for f in files:
            by_part.setdefault(os.path.dirname(f), []).append(f)
        return by_part

    def _discard_staged(self, add: list[str]) -> None:
        """Unlink a losing rewrite attempt's staged files — no manifest
        references them yet, so removal is safe and saves them from
        lingering until vacuum."""
        for rel in add:
            try:
                (self.values_path / rel).unlink()
            except FileNotFoundError:
                pass

    def compact(self, *, max_files_per_partition: int = 4, target_files: int = 1, cluster: str = "linear") -> list[str]:
        """Compaction as a manifest swap: fragmented partitions are rewritten
        into fresh files, then ONE commit removes the old files and adds the
        new — readers pinned at older versions keep a consistent view (the
        v1 store deletes the directory under them). ``cluster`` picks the
        layout (linear primary-key order or series×time Z-order, see
        Store._cluster_sort).

        The commit is pinned to the file list the rewrite read
        (``base_version``): losing the OCC race to a concurrent append
        redoes the whole scan/rewrite against the winner's manifest, so a
        freshly appended fragment is either re-compacted or left for the
        next run — never silently dropped from the new version."""
        while True:
            base_v, files = self._load()
            add: list[str] = []
            remove: set[str] = set()
            compacted: list[str] = []
            for part, fs in sorted(self._partition_files(files).items()):
                if len(fs) <= max_files_per_partition:
                    continue
                tmp = self.root / "_compact_tmp" / uuid.uuid4().hex
                with micros_parquet_writes(self.spark):
                    (
                        self._cluster_sort(
                            self.spark.read.option("basePath", str(self.values_path))
                            .parquet(*[str(self.values_path / f) for f in fs])
                            .drop("retention", "vt_month"),
                            cluster,
                            target_files,
                        )
                        .write.mode("overwrite")
                        .parquet(str(tmp))
                    )
                for src in sorted(tmp.rglob("*.parquet")):
                    rel = f"{part}/compact-{uuid.uuid4().hex}-{src.name}"
                    os.replace(src, self.values_path / rel)
                    add.append(rel)
                shutil.rmtree(tmp, ignore_errors=True)
                remove.update(fs)
                compacted.append(part)
            if not compacted:
                return []
            try:
                self._commit(add=add, remove=remove, op="compact", base_version=base_v)
                return compacted
            except CommitConflict:
                self._discard_staged(add)
                continue

    def delete_series(self, series_ids: "set[int] | list[int]") -> list[str]:
        """Right-to-erasure as a manifest swap (same zone-map pruning as v1:
        only partitions whose footer stats can contain a target rewrite)."""
        import pyarrow.parquet as pq

        targets = sorted(set(int(s) for s in series_ids))
        if not targets:
            return []
        while True:
            base_v, files = self._load()
            add: list[str] = []
            remove: set[str] = set()
            rewritten: list[str] = []
            for part, fs in sorted(self._partition_files(files).items()):
                lo = hi = None
                have_stats = True
                for f in fs:
                    md = pq.ParquetFile(self.values_path / f).metadata
                    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx["series_id"]).statistics
                        if st is None or not st.has_min_max:
                            have_stats = False
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    if not have_stats:
                        break
                if have_stats and lo is not None and not any(lo <= t <= hi for t in targets):
                    continue  # zone maps prove absence — partition untouched
                tmp = self.root / "_delete_tmp" / uuid.uuid4().hex
                with micros_parquet_writes(self.spark):
                    (
                        self.spark.read.option("basePath", str(self.values_path))
                        .parquet(*[str(self.values_path / f) for f in fs])
                        .filter(~F.col("series_id").isin(targets))
                        .drop("retention", "vt_month")
                        .repartition(1)
                        .sortWithinPartitions(*_SORT_KEY)
                        .write.mode("overwrite")
                        .parquet(str(tmp))
                    )
                for src in sorted(tmp.rglob("*.parquet")):
                    rel = f"{part}/erase-{uuid.uuid4().hex}-{src.name}"
                    os.replace(src, self.values_path / rel)
                    add.append(rel)
                shutil.rmtree(tmp, ignore_errors=True)
                remove.update(fs)
                rewritten.append(part)
            if not rewritten:
                break
            try:
                # base_version pin: an erase that serializes AFTER a
                # concurrent append must re-scan the winner's files — they
                # may contain the very series being erased.
                self._commit(add=add, remove=remove, op="delete_series", base_version=base_v)
                break
            except CommitConflict:
                self._discard_staged(add)
                continue
        # run_series mapping stays directory-based (see class docstring)
        if self.run_series_path.exists() and any(self.run_series_path.glob("*.parquet")):
            rs = self.spark.read.parquet(str(self.run_series_path)).filter(
                ~F.col("series_id").isin(targets)
            )
            tmp_rs = self.root / "_delete_tmp" / "run_series"
            with micros_parquet_writes(self.spark):
                rs.write.mode("overwrite").parquet(str(tmp_rs))
            shutil.rmtree(self.run_series_path)
            tmp_rs.rename(self.run_series_path)
            shutil.rmtree(self.root / "_delete_tmp", ignore_errors=True)
        return rewritten

    def apply_retention(self, now: datetime | None = None) -> list[str]:
        """TTL as a manifest swap: expired (retention, vt_month) partitions
        drop out of the NEW version; their files stay on disk for pinned
        readers until :meth:`vacuum`."""
        today = (now or datetime.now(timezone.utc)).date()
        while True:
            base_v, files = self._load()
            remove: set[str] = set()
            dropped: list[str] = []
            for part, fs in sorted(self._partition_files(files).items()):
                fields = dict(kv.split("=", 1) for kv in part.split("/") if "=" in kv)
                tier, ym = fields.get("retention"), fields.get("vt_month")
                ttl_days = RETENTION_TTL_DAYS.get(tier)
                if ttl_days is None or ym is None:
                    continue
                year, month = int(ym[:4]), int(ym[4:])
                nxt = date(year + (month == 12), month % 12 + 1, 1)
                if (nxt - timedelta(days=1)) + timedelta(days=ttl_days) < today:
                    remove.update(fs)
                    dropped.append(part)
            if not dropped:
                return []
            try:
                # base_version pin: a concurrent append into an expired
                # partition must be seen by the re-scan, not survive it.
                self._commit(add=[], remove=remove, op="ttl", base_version=base_v)
                return dropped
            except CommitConflict:
                continue

    # -- footer stats over the MANIFEST file set ----------------------------

    def partition_stats(self) -> list[dict]:
        """Same footer-only stats as the v1 store, but over the current
        manifest's file set — files awaiting vacuum (referenced only by old
        versions) must not count, or :meth:`fast_count` would overcount."""
        import pyarrow.parquet as pq

        _, files = self._load()
        out: list[dict] = []
        for part, fs in sorted(self._partition_files(files).items()):
            fields = dict(kv.split("=", 1) for kv in part.split("/") if "=" in kv)
            n_rows = n_files = 0
            sid_min = sid_max = vt_min = vt_max = None
            for f in fs:
                md = pq.ParquetFile(self.values_path / f).metadata
                n_files += 1
                n_rows += md.num_rows
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    for col in ("series_id", "valid_time"):
                        st = md.row_group(rg).column(idx[col]).statistics
                        if st is None or not st.has_min_max:
                            continue
                        if col == "series_id":
                            sid_min = st.min if sid_min is None else min(sid_min, st.min)
                            sid_max = st.max if sid_max is None else max(sid_max, st.max)
                        else:
                            vt_min = st.min if vt_min is None else min(vt_min, st.min)
                            vt_max = st.max if vt_max is None else max(vt_max, st.max)
            out.append(
                {
                    "retention": fields.get("retention"),
                    "vt_month": fields.get("vt_month"),
                    "n_rows": n_rows,
                    "n_files": n_files,
                    "series_id_min": sid_min,
                    "series_id_max": sid_max,
                    "valid_time_min": vt_min,
                    "valid_time_max": vt_max,
                }
            )
        return out

    # -- vacuum: the only destructive step ----------------------------------

    def vacuum(self, *, keep_last: int = 1, min_age_s: float = 3600.0) -> dict:
        """Truncate history to the last ``keep_last`` versions and delete
        data files no kept version references. Returns counts. After vacuum,
        time travel reaches only the kept versions (older reads raise), and
        txn idempotence markers in truncated manifests are forgotten — keep
        ``keep_last`` above any streaming checkpoint's replay horizon.

        ``min_age_s`` is the concurrent-writer guard (Delta's ``VACUUM
        RETAIN``): a writer renames its staged files into the dataset
        BEFORE its manifest commit, so an unreferenced-but-young file may
        belong to an in-flight commit — only files older than the grace
        window are deleted. Set 0 only when no writer can be active."""
        import time as _t

        vs = self._versions()
        keep = set(vs[-keep_last:]) if vs else set()
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._load(v)[1])
        cutoff = _t.time() - min_age_s
        removed_files = 0
        if self.values_path.exists():
            for p in self.values_path.rglob("*.parquet"):
                if str(p.relative_to(self.values_path)) not in referenced and p.stat().st_mtime <= cutoff:
                    p.unlink()
                    removed_files += 1
            for d in sorted(self.values_path.rglob("*"), reverse=True):
                if d.is_dir() and not any(d.iterdir()):
                    d.rmdir()
        removed_manifests = 0
        for v in vs:
            if v not in keep:
                try:
                    self._manifest_path(v).unlink()
                    removed_manifests += 1
                except FileNotFoundError:
                    pass  # a concurrent vacuum got there first
        return {"removed_files": removed_files, "removed_manifests": removed_manifests}
