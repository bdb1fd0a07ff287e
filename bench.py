"""Headline benchmark — runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": floor_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "aggregation": ...,
"run_totals": [...], "best_pass": min_total_sec}.

"value" is the SESSION FLOOR: each query's minimum over
$SPARK_GRAFT_BENCH_PASSES (default 3) in-session passes, summed — a
composite no single pass necessarily achieved (it can undercut
min(run_totals) when different queries bottom out in different passes).
"best_pass" = min(run_totals) is the best ACTUALLY-MEASURED pass
(ADVICE r11) — compare THAT against pre-r11 single-pass BENCH artifacts;
the composite floor is only like-for-like with other floors. The measured
per-pass wall-clock totals are in "run_totals"; the host's ~2×
day-over-day throughput swing (documented since r2) is why the floor,
not a single noisy pass, is the recorded headline.

Materialization uses the noop datasource: the full plan executes on the
cluster (every row produced and serialized) with no driver-side collect —
the honest way to time a distributed query.

r14 additions (VERDICT r13 task #2 — restore headline compute signal; all
ADDITIVE, the primary fields above are computed exactly as before):

- "queries_exec_ms": per query, min-over-passes of summed per-stage
  executorRunTime (cluster compute time), attributed via labelled job
  descriptions parsed from the session's event log AFTER the timed passes
  — separates data-dependent compute from the fixed per-query session
  overhead that dominates wall time at sf0.1.
- When $SPARK_GRAFT_STRESS_DIR names a larger replicated input directory
  (tools/scaleprobe.py --keep builds a join-consistent one), the same
  headline also runs against it and lands in "stress_queries" /
  "stress_run_totals" / "stress_queries_exec_ms". Unset by default — the
  driver's runs are unchanged.
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


_EVLOG_DIR = "/tmp/timedb_bench_evlog"


def collect_exec_ms(spark) -> tuple[dict, dict]:
    """Parse the session's Spark event log for per-stage executorRunTime
    and attribute it to the ``bench:<tag>:<pass>:<query>`` job
    descriptions. Returns ({query: min-over-passes ms}, same for the
    stress tag). Stops the session first (closes/renames the log). Best
    effort: any failure returns empty dicts — the wall-clock contract
    fields never depend on this."""
    try:
        appid = spark.sparkContext.applicationId
        spark.stop()
        path = os.path.join(_EVLOG_DIR, appid)
        if not os.path.exists(path):
            path += ".inprogress"
        stage_ms: dict[int, int] = {}
        job_stages: dict[str, list[int]] = {}
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                    if desc.startswith("bench:"):
                        job_stages.setdefault(desc, []).extend(ev.get("Stage IDs", []))
                elif kind == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    ms = 0
                    for acc in si.get("Accumulables", []):
                        if acc.get("Name") == "internal.metrics.executorRunTime":
                            ms = int(acc.get("Value", 0))
                    stage_ms[si.get("Stage ID")] = ms
        per_tag: dict[str, dict[str, int]] = {"main": {}, "stress": {}}
        for desc, stages in job_stages.items():
            _, tag, _p, name = desc.split(":", 3)
            total = sum(stage_ms.get(s, 0) for s in set(stages))
            cur = per_tag.setdefault(tag, {})
            # min over passes: accumulate per (tag, pass, name) first
            key = f"{_p}:{name}"
            cur[key] = cur.get(key, 0) + total
        out: dict[str, dict[str, int]] = {"main": {}, "stress": {}}
        for tag, vals in per_tag.items():
            for key, total in vals.items():
                _p, name = key.split(":", 1)
                t = out.setdefault(tag, {})
                if name not in t or total < t[name]:
                    t[name] = total
        return out.get("main", {}), out.get("stress", {})
    except Exception:
        return {}, {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    try:
        os.makedirs(_EVLOG_DIR, exist_ok=True)
        spark = get_spark(
            "timedb_spark-bench",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": _EVLOG_DIR,
                # one plain-text file per app — the parser below reads it
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
    except Exception:
        spark = get_spark("timedb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM + file index once (not counted): tiny plan end-to-end.
    queries["tpch_q3"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Three passes, per-query MIN: the host's throughput swings ~2× day to
    # day (documented since r2; VERDICT r10 asked the recorded artifact to
    # capture the session floor rather than a single noisy pass). The min
    # is the reproducible number — noise only ever adds time.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    # Executor-side compute signal (r14, VERDICT r13 "what's wrong" #1): at
    # sf0.1 the wall-clock headline is dominated by fixed per-query session
    # overhead (~0.4-1.1 s/query planning + stage launch), so wall seconds
    # alone stopped differentiating compute. Each timed query is labelled
    # with a job description; after the passes the Spark event log is
    # parsed for per-stage executorRunTime and attributed back to the
    # label — zero overhead inside the timed region, and the primary
    # "queries"/"value" fields are computed exactly as before
    # (additions-only).
    def run_headline(sfd: str, n_passes: int, tag: str):
        times: dict[str, float] = {}
        totals: list[float] = []
        for p in range(n_passes):
            total = 0.0
            for name in HEADLINE:
                if name not in queries:
                    continue
                spark.sparkContext.setJobDescription(f"bench:{tag}:{p}:{name}")
                t0 = time.perf_counter()
                queries[name](spark, sfd).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                spark.sparkContext.setJobDescription(None)
                total += dt
                if name not in times or dt < times[name]:
                    times[name] = dt
            totals.append(round(total, 3))
        return times, totals

    times, run_totals = run_headline(sf_dir, passes, "main")

    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "aggregation": f"per-query min of {passes} in-session passes",
        "run_totals": run_totals,
        "best_pass": min(run_totals) if run_totals else None,
    }
    # Optional stress pass (VERDICT r13 task #2: restore headline compute
    # signal): when SPARK_GRAFT_STRESS_DIR names a larger replicated input
    # (tools/scaleprobe.py --keep builds one), the same headline runs
    # against it and the numbers are RECORDED ALONGSIDE — never mixed into
    # the primary fields, so driver comparisons stay valid. Unset (the
    # driver default) this block is a no-op.
    stress_dir = os.environ.get("SPARK_GRAFT_STRESS_DIR")
    if stress_dir:
        s_passes = int(os.environ.get("SPARK_GRAFT_STRESS_PASSES", "2"))
        s_times, s_totals = run_headline(stress_dir, s_passes, "stress")
        out["stress_dir"] = stress_dir
        out["stress_queries"] = s_times
        out["stress_run_totals"] = s_totals

    exec_main, exec_stress = collect_exec_ms(spark)
    if exec_main:
        out["queries_exec_ms"] = exec_main
    if exec_stress:
        out["stress_queries_exec_ms"] = exec_stress
    print(json.dumps(out))


if __name__ == "__main__":
    main()
