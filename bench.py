"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Two parts:
  1. Headline registry queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
     local[$SPARK_GRAFT_CPUS]; each forced end-to-end with a noop sink
     (no driver collect bias).
  2. Flagship pipeline throughput (sequences/sec, tokens/sec) on a cached
     deterministic token-table parquet, run at TWO parallelism levels —
     local[8] vs local[32] standing in for N vs 4N executors (no real
     cluster in this sandbox) — reporting scaling efficiency
     thr(32)/(4*thr(8)) per the BASELINE.json north rule (target >= 0.8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "500000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        ".bench_cache"))

HEADLINE = [
    "grep", "regex_extract", "split_explode", "broadcast_enrich",
    "routing_fanout", "per_sink_aggregates", "cacheloop_agg", "sessionize",
    "multiline", "asof_lru_lookup", "pricing_summary", "segment_order_stats",
    "dedup_exact", "minhash_lsh_dedup", "simhash_near_pairs",
    "ann_brute_force_topk", "token_stats", "quality_features",
]


def _noop_force(df) -> int:
    """Force full computation without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _fresh_session(master: str, name: str):
    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # allow the JVM gateway to release the old context
        time.sleep(1)
    from pastash_spark.session import get_spark
    s = get_spark(name, master=master)
    s.sparkContext.setLogLevel("ERROR")
    return s


def ensure_token_cache(path: str, n_rows: int) -> None:
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return
    from pastash_spark import datagen
    spark = _fresh_session(f"local[{CPUS}]", "bench-datagen")
    datagen.write_token_table(spark, path, n_rows)


def pipeline_throughput(master: str, token_path: str) -> dict:
    from pyspark.sql import functions as F
    from pastash_spark import datagen
    from pastash_spark.plans import flagship

    spark = _fresh_session(master, f"bench-{master}")
    df = spark.read.parquet(token_path)
    lookup = datagen.source_lookup(spark)
    # warm-up: JIT + file listing (excluded from the measurement)
    out = flagship.build(df, lookup)
    _noop_force(out["aggregates"])

    t0 = time.time()
    out = flagship.build(df, lookup)
    stats = (out["routed"]
             .groupBy()
             .agg(F.count("*").alias("rows"), F.sum("n_tok").alias("toks"))
             .collect()[0])
    agg_rows = out["aggregates"].count()
    wall = time.time() - t0
    return {
        "master": master,
        "wall_sec": round(wall, 3),
        "rows": stats.rows,
        "tokens": int(stats.toks),
        "seq_per_sec": round(stats.rows / wall, 1),
        "tok_per_sec": round(stats.toks / wall, 1),
        "agg_rows": agg_rows,
    }


def main() -> None:
    token_path = os.path.join(CACHE_DIR, f"tokens_{BENCH_ROWS}")
    ensure_token_cache(token_path, BENCH_ROWS)

    # --- scaling: same job, same input, two parallelism levels ---
    lo = pipeline_throughput("local[8]", token_path)
    hi = pipeline_throughput(f"local[{CPUS}]", token_path)
    efficiency = (hi["tok_per_sec"] / lo["tok_per_sec"]) / (CPUS / 8)

    # --- headline queries at SF_DIR ---
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    spark = _fresh_session(f"local[{CPUS}]", "bench-queries")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, SF_DIR)
            _noop_force(df)  # warm
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            _noop_force(df)
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # pragma: no cover
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t > 0), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "throughput": {"local8": lo, f"local{CPUS}": hi},
        "scaling": {
            "from": "local[8]", "to": f"local[{CPUS}]",
            "factor": CPUS / 8,
            "tok_per_sec_from": lo["tok_per_sec"],
            "tok_per_sec_to": hi["tok_per_sec"],
            "efficiency": round(efficiency, 3),
        },
        "bench_rows": BENCH_ROWS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
