"""Delta Lake passthrough store (``table_format="delta"``).

The directory store (store.py) hand-rolls atomic publish + partition TTL on
plain parquet; snapstore.py hand-rolls a manifest snapshot protocol. A
production 100 TB deployment would reach for a lakehouse table format
instead — atomic multi-file commits, snapshot isolation, time travel and
OPTIMIZE come from the format. This module maps the same ``Store`` surface
onto delta-spark 1:1:

==================  =====================================================
Store method        Delta mapping
==================  =====================================================
create              empty ``.write.format("delta").partitionBy(...)``
append_values       ``mode("append")`` — an ATOMIC multi-file commit (the
                    guarantee store.py's per-file rename publish only
                    approximates)
read_values         ``spark.read.format("delta").load``
compact             ``DeltaTable.optimize().executeCompaction()`` /
                    ``executeZOrderBy("series_id", "valid_time")``
                    (cluster="zorder" — the functions/zorder.py analogue)
apply_retention     partition-predicate ``DELETE`` per expired tier/month
                    (metadata-only remove actions, like CH part drops)
delete_series       ``DeltaTable.delete(series_id IN ...)`` — Delta's
                    file-stats pruning rewrites only files that can
                    contain a target id, matching store.py's footer-
                    min/max rewrite
snapshot read       ``option("versionAsOf"/"timestampAsOf")`` — the
                    snapstore.py time-travel surface, from the format
vacuum              ``DeltaTable.vacuum(retention_hours)``
==================  =====================================================

Gate: delta-spark needs BOTH the Python package and the matching JVM jars
(``io.delta:delta-spark`` via ``spark.jars.packages`` + the SQL extension
conf) — neither is installed here and the environment has no network, so
construction raises with the exact unmet precondition (state_v2 pattern:
the probe result is importable as ``DELTA_MISSING`` and the parametrized
store tests auto-skip with it). The mapping is exercised wherever
delta-spark IS present via the same ``tests/test_store_client.py``
parametrization.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedb_spark.schema import RETENTION_TTL_DAYS, RUN_SERIES_SCHEMA, SERIES_VALUES_SCHEMA
from timedb_spark.store import _SORT_KEY

#: exact unmet precondition ("" when runnable) — surfaced in skip messages
#: and the construction-time gate so every probe records WHY it is closed.
DELTA_MISSING = ""
try:
    from delta.tables import DeltaTable  # noqa: F401
except ImportError:
    DELTA_MISSING = (
        "python package 'delta-spark' (import delta.tables) not installed; "
        "also requires the io.delta:delta-spark JVM jars and "
        "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
    )


def _live_adds(spark: SparkSession, values_path: Path) -> DataFrame | None:
    """Live add actions from a Delta transaction log: per path, the add with
    the highest commit version, kept only when no remove supersedes it at a
    later (or equal) version. Module-level and pure log-JSON parsing — no
    delta-spark needed — so the liveness rule is unit-testable even where
    the package gate is closed. Returns None when the log has no adds.

    Liveness is max-version arbitration, NOT an anti-join on "ever removed":
    a path re-added after a remove (RESTORE, time-travel re-commit) is live
    again. Commit version = the log filename's numeric prefix (the Delta
    protocol's commit ordering)."""
    log = spark.read.json(str(values_path / "_delta_log" / "*.json")).withColumn(
        "_v",
        F.regexp_extract(F.col("_metadata.file_path"), r"(\d+)\.json$", 1).cast("long"),
    )
    if "add" not in log.columns:
        return None
    adds = (
        log.filter(F.col("add").isNotNull())
        .select(
            F.col("add.path").alias("path"),
            F.col("_v"),
            F.struct(
                F.col("add.partitionValues.retention").alias("retention"),
                F.col("add.partitionValues.vt_month").alias("vt_month"),
                F.from_json(F.col("add.stats"), "numRecords LONG").getField("numRecords").alias("numRecords"),
            ).alias("_a"),
        )
        .groupBy("path")
        .agg(F.max("_v").alias("_av"), F.max_by("_a", "_v").alias("_a"))
    )
    if "remove" in log.columns:
        removes = (
            log.filter(F.col("remove").isNotNull())
            .select(F.col("remove.path").alias("path"), "_v")
            .groupBy("path")
            .agg(F.max("_v").alias("_rv"))
        )
        adds = adds.join(removes, on="path", how="left").filter(
            F.col("_rv").isNull() | (F.col("_av") > F.col("_rv"))
        )
    return adds.select("path", "_a.retention", "_a.vt_month", "_a.numRecords")


def _require_delta(spark: SparkSession) -> None:
    if DELTA_MISSING:
        raise NotImplementedError(f"table_format='delta' unavailable: missing {DELTA_MISSING}")
    ext = spark.conf.get("spark.sql.extensions", "")
    if "DeltaSparkSessionExtension" not in (ext or ""):
        raise NotImplementedError(
            "table_format='delta' unavailable: session built without "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
            "(set it plus spark.sql.catalog.spark_catalog=org.apache.spark."
            "sql.delta.catalog.DeltaCatalog before SparkSession creation)"
        )


class DeltaStore:
    """Same surface as :class:`timedb_spark.store.Store`, Delta-backed."""

    def __init__(self, spark: SparkSession, root: str):
        _require_delta(spark)
        self.spark = spark
        self.root = Path(root)
        self.values_path = self.root / "series_values"
        self.run_series_path = self.root / "run_series"

    # -- schema management -------------------------------------------------

    def create(self) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        if not (self.values_path / "_delta_log").exists():
            empty = self.spark.createDataFrame([], SERIES_VALUES_SCHEMA).withColumn(
                "vt_month", F.lit(None).cast("string")
            )
            (
                empty.write.format("delta")
                .partitionBy("retention", "vt_month")
                .mode("overwrite")
                .save(str(self.values_path))
            )
        if not (self.run_series_path / "_delta_log").exists():
            empty_rs = self.spark.createDataFrame([], RUN_SERIES_SCHEMA)
            empty_rs.write.format("delta").mode("overwrite").save(str(self.run_series_path))

    def delete(self) -> None:
        import shutil

        for p in (self.values_path, self.run_series_path):
            if p.exists():
                shutil.rmtree(p)

    # -- writes (atomic multi-file commits — the format's whole point) -----

    def append_values(self, df: DataFrame) -> None:
        cols = [f.name for f in SERIES_VALUES_SCHEMA.fields]
        (
            df.select(cols)
            .withColumn("vt_month", F.date_format("valid_time", "yyyyMM"))
            .repartition("retention", "vt_month")
            # same zone-map-preserving sorted layout as store.py
            .sortWithinPartitions("retention", "vt_month", *_SORT_KEY)
            .write.format("delta")
            .mode("append")
            .save(str(self.values_path))
        )

    def append_run_series(self, df: DataFrame) -> None:
        (
            df.select("series_id", "run_id", "first_seen")
            .write.format("delta")
            .mode("append")
            .save(str(self.run_series_path))
        )

    # -- reads -------------------------------------------------------------

    def read_values(self, *, version: int | None = None, timestamp: datetime | None = None) -> DataFrame:
        """Current table, or a time-travel snapshot (the snapstore.py
        ``read_values(version=...)`` surface, provided by the format)."""
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        if timestamp is not None:
            reader = reader.option("timestampAsOf", timestamp.isoformat(sep=" "))
        return reader.load(str(self.values_path))

    def prune_months(self, df: DataFrame, start_valid: datetime | None, end_valid: datetime | None) -> DataFrame:
        if start_valid is not None:
            df = df.filter(F.col("vt_month") >= start_valid.strftime("%Y%m"))
        if end_valid is not None:
            df = df.filter(F.col("vt_month") <= end_valid.strftime("%Y%m"))
        return df

    def read_run_series(self) -> DataFrame:
        raw = self.spark.read.format("delta").load(str(self.run_series_path))
        return raw.groupBy("series_id", "run_id").agg(F.max("first_seen").alias("first_seen"))

    # -- stats / maintenance ----------------------------------------------

    def partition_stats(self) -> list[dict]:
        """Per-(retention, vt_month) row/file counts for the LIVE table
        from the transaction log — metadata only, zero data IO (the log
        JSON holds numRecords per add action; the store.py analogue reads
        parquet footers). A file is live iff its LATEST log action (by
        commit version) is an add — not "never removed": RESTORE /
        time-travel re-commits re-ADD a previously removed path at a later
        version, and a blanket remove anti-join would undercount it forever
        (ADVICE r5), skewing fast_count and apply_retention with it."""
        adds = _live_adds(self.spark, self.values_path)
        if adds is None:
            return []
        live = (
            adds.groupBy("retention", "vt_month")
            .agg(F.sum("numRecords").alias("n_rows"), F.count(F.lit(1)).alias("n_files"))
            .orderBy("retention", "vt_month")
        )
        return [r.asDict() for r in live.collect()]

    def compact(self, *, max_files_per_partition: int = 4, target_files: int = 1, cluster: str = "linear") -> list[str]:
        from delta.tables import DeltaTable

        dt = DeltaTable.forPath(self.spark, str(self.values_path))
        if cluster == "zorder":
            dt.optimize().executeZOrderBy("series_id", "valid_time")
        elif cluster == "linear":
            dt.optimize().executeCompaction()
        else:
            raise ValueError(f"Unknown cluster {cluster!r}. Valid values: 'linear', 'zorder'.")
        return [f"{p['retention']}/{p['vt_month']}" for p in self.partition_stats()]

    def apply_retention(self, now: datetime | None = None) -> list[str]:
        """Partition-predicate DELETE per expired (tier, month) — Delta
        turns a delete aligned to partition boundaries into metadata-only
        remove actions, the CH part-drop analogue."""
        from delta.tables import DeltaTable

        today = (now or datetime.now(timezone.utc)).date()
        dt = DeltaTable.forPath(self.spark, str(self.values_path))
        dropped: list[str] = []
        for p in self.partition_stats():
            tier, ym = p["retention"], p["vt_month"]
            ttl_days = RETENTION_TTL_DAYS.get(tier)
            if ttl_days is None or not ym:
                continue
            year, month = int(ym[:4]), int(ym[4:])
            nxt = date(year + (month == 12), month % 12 + 1, 1)
            if (nxt - timedelta(days=1)) + timedelta(days=ttl_days) < today:
                dt.delete((F.col("retention") == tier) & (F.col("vt_month") == ym))
                dropped.append(f"retention={tier}/vt_month={ym}")
        return dropped

    def fast_count(self, *, retention=None, start_valid=None, end_valid=None) -> int:
        """Months fully inside the range answer from log stats; boundary
        months scan partition-pruned (same split as store.py.fast_count)."""
        tiers = {retention} if isinstance(retention, str) else (set(retention) if retention else None)
        total = 0
        edge: list[tuple[str, str]] = []
        for p in self.partition_stats():
            if tiers is not None and p["retention"] not in tiers:
                continue
            ym = p["vt_month"]
            if not ym:  # null valid_time rows: no month to range-prune on —
                if start_valid is None and end_valid is None:
                    total += p["n_rows"]  # unbounded count includes them
                continue  # any time bound excludes a null valid_time
            m_start = datetime(int(ym[:4]), int(ym[4:]), 1)
            nxt = date(m_start.year + (m_start.month == 12), m_start.month % 12 + 1, 1)
            m_end = datetime(nxt.year, nxt.month, nxt.day)
            if (end_valid is not None and m_start >= end_valid) or (
                start_valid is not None and m_end <= start_valid
            ):
                continue
            inside = (start_valid is None or start_valid <= m_start) and (
                end_valid is None or m_end <= end_valid
            )
            if inside:
                total += p["n_rows"]
            else:
                edge.append((p["retention"], ym))
        if edge:
            df = self.read_values()
            cond = F.lit(False)
            for tier, ym in edge:
                cond = cond | ((F.col("retention") == tier) & (F.col("vt_month") == ym))
            df = df.filter(cond)
            if start_valid is not None:
                df = df.filter(F.col("valid_time") >= start_valid)
            if end_valid is not None:
                df = df.filter(F.col("valid_time") < end_valid)
            total += df.count()
        return total

    def delete_series(self, series_ids) -> list[str]:
        from delta.tables import DeltaTable

        targets = sorted(set(int(s) for s in series_ids))
        if not targets:
            return []
        dt = DeltaTable.forPath(self.spark, str(self.values_path))
        dt.delete(F.col("series_id").isin(targets))
        return [f"{p['retention']}/{p['vt_month']}" for p in self.partition_stats()]

    def vacuum(self, retention_hours: float = 168.0) -> None:
        from delta.tables import DeltaTable

        DeltaTable.forPath(self.spark, str(self.values_path)).vacuum(retention_hours)
