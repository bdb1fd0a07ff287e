"""Superlinearity probe beyond sf0.1 (VERDICT r11 task #4).

Testdata is read-only and capped at sf0.1, so this derives a ~Nx synthetic
stress frame under /tmp (deterministic replication — clearly NOT gate
data) and times the top-sweep-band queries at sf0.1 vs the stress frame
in ONE session. A blocked/bucketed plan should scale ~linearly in rows;
a ratio well above the replica count means some candidate space or
shuffle is quadratic in practice.

Replication grows the ENTITY space (the TPC-H scaling axis), never the
per-key density, so the workload shape stays comparable:

- events:    user_id/event_id offset per replica (more series, same
             time window — the bitemporal store gains series, not deeper
             revision chains);
- documents: doc_id offset AND every word suffixed with ``_r<i>`` for
             replica i>0 — intra-replica dup structure is preserved
             verbatim while cross-replica docs share ZERO shingles, so
             shingle-blocked candidate generation scales linearly (naive
             text copies would share all shingles and grow the pair
             space quadratically in replicas, which a real bigger corpus
             does not);
- lineitem:  part/order/supp keys offset per replica — disjoint
             co-purchase graphs (a real sf1 has more parts, not denser
             ones);
- embeddings: vec_id AND label offset per replica, vector components
             ROLLED by the replica index — norms and within-replica
             geometry are preserved while cross-replica cosines
             decorrelate (identical copies would make every LSH/kmeans
             bucket 10× denser with genuine near-dups, growing the pair
             space quadratically in replicas). The fixed ANN query set
             (vec_id < N_QUERIES) stays replica-0 only — corpus scales,
             queries sampled, the production ANN shape.

Usage: python tools/scaleprobe.py [--replicas 10] [--out SCALEPROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

PROBES = [
    "dedup_report",
    "graph_clustering",
    "graph_triangles",
    "rollup_bitemporal_agg",
    "rollup_pit_backtest",
    # similarity / text family (r12 extension — embeddings replicated too)
    "dedup_semantic",
    "ann_ivf",
    "embed_kmeans",
    "dedup_winnowing",
    "text_tfidf",
    "contamination_check",
]

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stress_manifest(replicas: int) -> dict:
    """Cache key for a built stress dir — bump "v" whenever
    build_stress_dir's output changes so stale dirs rebuild. Shared with
    the tools/diag probes."""
    return {"replicas": replicas, "base_sf_dir": BASE_SF_DIR,
            "tables": ["events", "documents", "embeddings", "lineitem",
                       "orders", "customer", "supplier", "part", "nation", "region"], "v": 5}


def build_stress_dir(spark: SparkSession, base: str, out_dir: str, replicas: int) -> None:
    from timedb_spark.io.tables import load_table
    from timedb_spark.session import micros_parquet_writes

    os.makedirs(out_dir, exist_ok=True)

    def replicate(name: str, transform) -> None:
        df = load_table(spark, base, name)
        parts = [transform(df, i) for i in range(replicas)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        with micros_parquet_writes(spark):
            out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    ev = load_table(spark, base, "events")
    u_span = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e_span = ev.agg(F.max("event_id")).collect()[0][0] + 1

    replicate(
        "events",
        lambda df, i: df.withColumns({
            "user_id": F.col("user_id") + F.lit(i * u_span),
            "event_id": F.col("event_id") + F.lit(i * e_span),
        }),
    )

    docs = load_table(spark, base, "documents")
    # doc ids carry no density assumption (shingle ops never key on id
    # arithmetic), so the stride simply clears doc_corpus's planted space
    # (+100000 near, +200000 exact) for any replica count
    d_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1 + 200001

    def doc_tx(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_span))
        if i == 0:
            return df
        suffixed = F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"), lambda w: F.concat(w, F.lit(f"_r{i}"))),
            " ",
        )
        return df.withColumn("text", suffixed)

    replicate("documents", doc_tx)

    emb = load_table(spark, base, "embeddings")
    # DENSE stride: the kmeans/SemDeDup centroid seeding keys on vec_id
    # modulo (dense-id testdata contract), so a sparse stride collapses the
    # cluster structure into one giant quadratic bucket. Density + the
    # planted-id space (+100000) instead bound the replica count — guarded
    # loudly below.
    v_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    if replicas * v_span > 100000:
        raise SystemExit(
            f"replicas*{v_span} vec_ids would collide with emb_corpus's "
            "+100000 planted-duplicate id space — lower --replicas"
        )
    l_span = emb.agg(F.max("label")).collect()[0][0] + 1

    def emb_tx(df, i):
        df = df.withColumns({
            "vec_id": F.col("vec_id") + F.lit(i * v_span),
            "label": (F.col("label") + F.lit(i * l_span)).cast("int"),
        })
        if i == 0:
            return df
        dim_m = 64 - (i % 64)
        rolled = F.concat(
            F.slice("embedding", i % 64 + 1, dim_m), F.slice("embedding", 1, i % 64)
        )
        return df.withColumn("embedding", rolled)

    replicate("embeddings", emb_tx)

    # TPC-H universe: replicate facts AND dimensions with ONE span per key
    # domain (max over every table carrying the key), so each replica is a
    # disjoint, join-consistent TPC-H world sharing only nation/region —
    # which makes the stress dir a drop-in SPARK_GRAFT_SF_DIR for the bench
    # headline (tpch_q3/q5 join orders/customer/supplier). r14 addition;
    # prior versions replicated lineitem alone.
    li = load_table(spark, base, "lineitem")
    orders = load_table(spark, base, "orders")
    cust = load_table(spark, base, "customer")
    supp = load_table(spark, base, "supplier")
    part = load_table(spark, base, "part")
    li_spans = li.agg(F.max("l_partkey"), F.max("l_orderkey"), F.max("l_suppkey")).collect()[0]
    p_span = max(int(li_spans[0]), int(part.agg(F.max("p_partkey")).collect()[0][0])) + 1
    o_span = max(int(li_spans[1]), int(orders.agg(F.max("o_orderkey")).collect()[0][0])) + 1
    s_span = max(int(li_spans[2]), int(supp.agg(F.max("s_suppkey")).collect()[0][0])) + 1
    c_span = max(
        int(orders.agg(F.max("o_custkey")).collect()[0][0]),
        int(cust.agg(F.max("c_custkey")).collect()[0][0]),
    ) + 1
    replicate(
        "lineitem",
        lambda df, i: df.withColumns({
            "l_partkey": F.col("l_partkey") + F.lit(i * p_span),
            "l_orderkey": F.col("l_orderkey") + F.lit(i * o_span),
            "l_suppkey": F.col("l_suppkey") + F.lit(i * s_span),
        }),
    )
    replicate(
        "orders",
        lambda df, i: df.withColumns({
            "o_orderkey": F.col("o_orderkey") + F.lit(i * o_span),
            "o_custkey": F.col("o_custkey") + F.lit(i * c_span),
        }),
    )
    replicate(
        "customer",
        lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * c_span)),
    )
    replicate(
        "supplier",
        lambda df, i: df.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(i * s_span)),
    )
    replicate(
        "part",
        lambda df, i: df.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * p_span)),
    )
    for dim in ("nation", "region"):
        with micros_parquet_writes(spark):
            load_table(spark, base, dim).write.mode("overwrite").parquet(f"{out_dir}/{dim}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="SCALEPROBE.json")
    ap.add_argument("--keep", action="store_true", help="keep the stress dir")
    args = ap.parse_args()

    if args.replicas > 64:
        sys.exit("replicas > 64 would produce identity vector rolls (i % 64 == 0)")

    from timedb_spark.session import get_spark

    spark = get_spark("timedb_spark-scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    stress_dir = f"/tmp/timedb_scaleprobe_x{args.replicas}"
    manifest = stress_manifest(args.replicas)
    mpath = f"{stress_dir}/_MANIFEST.json"
    have = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            have = json.load(f)
    if have != manifest:
        shutil.rmtree(stress_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_stress_dir(spark, BASE_SF_DIR, stress_dir, args.replicas)
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        print(f"built {stress_dir} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm the JVM once (not counted)
    run(PROBES[1], BASE_SF_DIR)

    results = {}
    for name in PROBES:
        base_s = run(name, BASE_SF_DIR)
        stress_s = run(name, stress_dir)
        results[name] = {
            "base_sec": base_s,
            "stress_sec": stress_s,
            "ratio": round(stress_s / base_s, 2) if base_s > 0 else None,
        }
        print(f"  {name:28s} base={base_s:8.2f}s  x{args.replicas}={stress_s:8.2f}s  "
              f"ratio={results[name]['ratio']}", file=sys.stderr)

    out = {
        "metric": "scaleprobe",
        "base_sf_dir": BASE_SF_DIR,
        "replicas": args.replicas,
        "linear_expectation": float(args.replicas),
        "queries": results,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(stress_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
