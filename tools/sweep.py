"""Full-surface timing sweep: run EVERY registered query once at a scale
factor and write per-query wall times as JSON — the local regression
baseline the bench driver can diff round over round (VERDICT r1 item 8).

Usage: python tools/sweep.py [sf_dir] [out.json]

Timing is end-to-end per query (plan + execute + collect) on the shared
local session, one pass in registration order, warm JVM but cold per-query
results (no persisted frames carried across queries beyond what the
operators themselves stage).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from timedb_spark.session import get_spark  # noqa: E402


def run(sf_dir: str, out_path: str | None) -> dict:
    spark = get_spark("sweep")
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.time()
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
            times[name] = round(time.time() - t0, 3)
            print(f"  {name:32s} {times[name]:7.2f}s  rows={n}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"  {name:32s} ERROR {errors[name]}", flush=True)
    result = {
        "sf_dir": sf_dir,
        "total_sec": round(time.time() - t_all, 1),
        "n_queries": len(times),
        "worst": max(times, key=times.get) if times else None,
        "queries": times,
        "errors": errors,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    return result


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else None
    r = run(sf, out)
    print(json.dumps({"total_sec": r["total_sec"], "worst": r["worst"], "n": r["n_queries"], "n_err": len(r["errors"])}))
    sys.exit(1 if r["errors"] else 0)
