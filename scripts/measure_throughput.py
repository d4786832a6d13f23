"""One isolated throughput measurement (fresh JVM): run the flagship
pipeline over a token parquet at a given master, print ONE JSON line.

A separate process per measurement is mandatory: successive SparkContexts
inside one JVM give wildly varying numbers (heap/metaspace fragmentation,
leftover python worker daemons) — measured 2-8x run-to-run swings.
bench.py shells out to this script.

Variants:
  parse    parse -> enrich -> route -> per-(sink,source) aggregate; the
           token arrays are carried but not re-scanned (the aggregate reads
           n_tok).  This is the scaling-evidence job: CPU-bound, so core
           scaling is observable.
  payload  same plus sum(size(tokens)) so every token array is decoded —
           the honest payload-inclusive tokens/sec, but memory-bandwidth
           bound (flat beyond the cores that saturate one socket's
           bandwidth on this box).

usage: measure_throughput.py <master> <parquet> [repeats] [variant]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, path = sys.argv[1], sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    variant = sys.argv[4] if len(sys.argv) > 4 else "parse"

    from pyspark.sql import functions as F
    from pastash_spark import datagen
    from pastash_spark.plans import flagship
    from pastash_spark.session import get_spark

    spark = get_spark(f"measure-{master}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    lookup = datagen.source_lookup(spark)

    def run_once() -> tuple[float, int, int]:
        out = flagship.build(spark.read.parquet(path), lookup)
        tok_expr = (F.sum(F.size("tokens")) if variant == "payload"
                    else F.sum("n_tok"))
        t0 = time.time()
        rows_ = (out["routed"]
                 .groupBy("_route", "source")
                 .agg(F.count("*").alias("rows"),
                      tok_expr.alias("toks"),
                      F.avg("n_tok").alias("avg_ntok"))
                 .collect())
        wall = time.time() - t0
        return wall, sum(r.rows for r in rows_), int(sum(r.toks for r in rows_))

    run_once()  # warm: JIT, python workers, page cache
    walls = []
    rows = toks = 0
    for _ in range(repeats):
        w, rows, toks = run_once()
        walls.append(w)
    wall = sorted(walls)[len(walls) // 2]  # median
    print(json.dumps({
        "master": master, "variant": variant, "wall_sec": round(wall, 3),
        "walls": [round(w, 3) for w in walls],
        "rows": rows, "tokens": toks,
        "seq_per_sec": round(rows / wall, 1),
        "tok_per_sec": round(toks / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
