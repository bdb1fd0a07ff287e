"""Local driver-mimic: run every __spark_entry__ query against its DuckDB
oracle at a given scale factor and report row-count / column / value parity.

Usage: python tools/parity.py [sf_dir] [--hostile] [query ...]

Normalization mirrors the driver contract: columns sorted by name, rows
compared as an order-insensitive multiset, floats rounded to 9 significant
digits, timestamps as ISO strings.

``--hostile`` runs every Spark query under a DRIVER-DEFAULT session instead
of the repo's tuned ``get_spark`` one: a ``newSession()`` with the Spark
default value restored for every runtime conf ``get_spark`` pins (INT96
output timestamps, no nanos-as-long legacy read, no arrow). This is the
full-register version of tests/test_hostile_session.py — the r6-r8
partition_stats reds were invisible to the pinned-conf mimic precisely
because the driver's own session carries Spark defaults (VERDICT r8
What's-wrong #1/#2: "gate correctness must not depend on driver-session
configuration the repo doesn't pin"). Run both postures before shipping a
window.
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from timedb_spark.io.tables import TABLE_NAMES  # noqa: E402
from timedb_spark.session import get_spark  # noqa: E402

#: (conf get_spark pins, Spark-default value the driver session runs with).
#: Covers exactly: outputTimestampType, nanosAsLong, arrow, and (added in
#: hostile_spark, JVM-default value) session.timeZone — the four pinned
#: confs that change RESULTS. Not restored: AQE/shuffle.partitions (plan
#: shape only) and inferTimestampNTZ (builder-frozen schema inference).
#: Mirrors tests/test_hostile_session.py::_DRIVER_DEFAULTS — keep in sync.
_DRIVER_DEFAULTS = {
    "spark.sql.parquet.outputTimestampType": "INT96",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "false",
}


def hostile_spark():
    """A session with the driver-default posture for the result-bearing
    runtime confs ``get_spark`` pins (see _DRIVER_DEFAULTS). ``newSession``
    shares the JVM but carries its own SQLConf; builder-time confs are
    inherited, so the explicit sets are what make it hostile.
    ``session.timeZone`` is reset to the JVM default (ADVICE r9) so the
    posture matches what an unpinned driver session actually runs with.
    Caveat (scope, not a bug): gate fingerprints are defined over the
    UTC-wall-clock reading of the NTZ testdata — both the driver host and
    this container run a UTC JVM, so the reset is a faithful no-op here;
    on a hypothetical non-UTC host, Spark's NTZ→session-TZ cast shifts
    instants while DuckDB stays naive, so date_format/unix_micros-based
    fingerprints would diverge BY CONSTRUCTION for every engine pair, not
    through a library defect. Non-UTC driver hosts are out of contract."""
    base = get_spark("parity-hostile")
    h = base.newSession()
    for k, v in _DRIVER_DEFAULTS.items():
        h.conf.set(k, v)
    jvm_tz = base._jvm.java.util.TimeZone.getDefault().getID()
    h.conf.set("spark.sql.session.timeZone", jvm_tz)
    return h


def nonflat_columns(schema) -> list[str]:
    """Columns the DRIVER canonicalizer cannot sort: its pandas
    factorize/sort_values dies on list/dict/bytes cells (TypeError:
    unhashable type — CORRECTNESS_r03 `thumb`, CORRECTNESS_r05 `codes`).
    The old _norm_cell here happily str()'d them, so the local mimic
    passed where the driver errored — twice. Gate queries must emit only
    flat sortable scalars; serialize arrays with concat_ws (Spark) /
    array_to_string (DuckDB) in a _q_* wrapper."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType))
    ]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            # FAITHFUL: -0.0 and +0.0 render differently downstream (repr,
            # str, pandas). Collapsing both to "0" would hide an engine that
            # emits -0.0 where the other emits +0.0 — the same mimic-blind-
            # spot class as the r5 array str() and r6 tz strip. An r8 scan
            # found zero -0.0 cells on either engine across all registered
            # queries at sf0.01; this keeps it that way.
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        return f"{v:.9g}"
    if isinstance(v, datetime):
        # FAITHFUL: keep tzinfo. The driver canonicalizer renders aware and
        # naive datetimes differently ('…+00:00' vs '…'); stripping tzinfo
        # here was the mimic's second blind spot (arrays r5, tz r6 —
        # partition_stats shipped hash-red while local parity said OK).
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def aware_datetime_columns(cols, rows) -> list[str]:
    """Columns holding tz-AWARE datetimes in collected rows. The gate speaks
    naive UTC everywhere (parquet micros → Spark collect → DuckDB); an aware
    value can only enter via driver-side Python fed to createDataFrame
    (pyarrow footer stats did exactly this — CORRECTNESS_r06
    partition_stats hash-red while the old tz-stripping _norm_cell said OK).
    Same genus as nonflat_columns: fail the CLASS, not the instance."""
    bad = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, datetime) and v.tzinfo is not None:
                bad.add(cols[i])
    return sorted(bad)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def run(sf_dir: str, only: list[str] | None = None, hostile: bool = False) -> bool:
    spark = hostile_spark() if hostile else get_spark("parity")
    if hostile:
        print("  [hostile driver-default session: "
              + ", ".join(f"{'.'.join(k.split('.')[-2:])}={v}" for k, v in _DRIVER_DEFAULTS.items()) + "]")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(queries))
        if unknown:
            # An unmatched filter must never produce a vacuous "ALL OK" —
            # a typo'd name (or a flag like --sf) selects nothing otherwise.
            print(f"ERROR: unknown query name(s): {unknown}")
            print(f"       registered: {sorted(queries)}")
            return False
    ok_all = True
    n_ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_ran += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        bad_cols = nonflat_columns(sdf.schema)
        if bad_cols:
            # Faithful-mimic hard failure: the driver canonicalizer would
            # TypeError on these, even if every value is correct.
            print(f"  {name:32s} FAIL non-flat gate columns (driver canonicalizer "
                  f"cannot sort array/map/struct/binary): {bad_cols}")
            ok_all = False
            continue
        s_rows = sdf.collect()
        s_cols = sdf.columns
        t_spark = time.time() - t0
        aware = aware_datetime_columns(s_cols, s_rows)
        if aware:
            print(f"  {name:32s} FAIL tz-aware datetime cells (gate speaks naive "
                  f"UTC; driver canonicalizer renders '+00:00'): {aware}")
            ok_all = False
            continue
        if name not in oracles:
            print(f"  {name:32s} rows={len(s_rows):7d}  (rows-only, no oracle)  [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        d_cols = rel.columns
        d_rows = rel.fetchall()
        t_duck = time.time() - t0

        ok = True
        msgs = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            ns, nd = _norm_rows(s_cols, [tuple(r) for r in s_rows]), _norm_rows(d_cols, d_rows)
            if ns != nd:
                ok = False
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                extra_s = [x for x in ns if x not in set(nd)][:3]
                msgs.append(f"values differ; first diffs={diff or extra_s}")
        status = "OK " if ok else "FAIL"
        print(f"  {name:32s} {status} rows={len(s_rows):7d}  [spark {t_spark:.1f}s / duck {t_duck:.1f}s]" + ("  " + "; ".join(msgs) if msgs else ""))
        ok_all = ok_all and ok
    if n_ran == 0:
        print("ERROR: selection matched no queries")
        return False
    return ok_all


if __name__ == "__main__":
    args = sys.argv[1:]
    hostile = "--hostile" in args
    args = [a for a in args if a != "--hostile"]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    ok = run(sf, only, hostile=hostile)
    print("PARITY:", "ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)
