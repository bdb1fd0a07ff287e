"""Headline benchmark — runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Materialization uses the noop datasource: the full plan executes on the
cluster (every row produced and serialized) with no driver-side collect —
the honest way to time a distributed query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from timedb_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "bt_read_latest",
    "bt_read_overlapping",
    "bt_read_latest_changes",
    "bt_read_relative",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_window",
    "asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("timedb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM + file index once (not counted): tiny plan end-to-end.
    queries["tpch_q3"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
