"""Per-partition lineage / metrics checkpoint table -> resumable batch runs.

Replaces the reference's file-position database (``--db_file`` persisting
byte offsets + last-read line, /root/reference/lib/lib/monitor_file.js:289-316,
bin/pastash:210-234) with the table-native equivalent the north rule names:
a lineage table recording which input partitions each run has fully processed
plus their metrics; resuming = anti-join pending work against it.

The work unit is a *partition bucket* — a stable hash range of the
partitioning key (doc_id) — so progress tracking is O(buckets), not O(rows),
and a 100 TB backfill restarts by skipping completed buckets, each of which
was written atomically (write sink for bucket, then commit lineage row).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "_bucket"

LINEAGE_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("rows", T.LongType(), True),
    T.StructField("tokens", T.LongType(), True),
    T.StructField("wall_sec", T.DoubleType(), True),
    T.StructField("committed_at", T.TimestampType(), True),
])


def with_bucket(df: DataFrame, key: str = "doc_id", n_buckets: int = 64) -> DataFrame:
    """Deterministic bucket assignment: pmod(xxhash64(key), n).  Hash (not
    range) buckets so progress units stay balanced without sampling."""
    return df.withColumn(BUCKET_COL,
                         F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


class LineageLog:
    """Append-only lineage table on parquet.

    Commits happen one-file-per-bucket (coalesce(1) append) AFTER the bucket's
    sink write succeeds, so a crash between write and commit re-processes at
    most one bucket — and sink writes are per-bucket directories overwritten
    idempotently, which makes the retry safe (exactly-once per bucket).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def completed_buckets(self) -> set[int]:
        if not _exists(self.path):
            return set()
        try:
            rows = (self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
                    .filter(F.col("status") == "done")
                    .select("bucket").distinct().collect())
        except Exception as e:  # first run on object storage: path absent
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return set()
            raise
        return {r.bucket for r in rows}

    def commit(self, bucket: int, *, run_id: str, rows: int | None = None,
               tokens: int | None = None, wall_sec: float | None = None,
               status: str = "done") -> None:
        row = [(run_id, bucket, status, rows, tokens, wall_sec, None)]
        df = (self.spark.createDataFrame(row, LINEAGE_SCHEMA)
              .withColumn("committed_at", F.current_timestamp()))
        df.coalesce(1).write.mode("append").parquet(self.path)

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)


def _exists(path: str) -> bool:
    if "://" in path:  # non-local fs: probe inside completed_buckets instead
        return True
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path))


def run_resumable(
    df_bucketed: DataFrame,
    lineage: LineageLog,
    process_and_write,
    *,
    n_buckets: int,
    run_id: str | None = None,
    buckets_per_job: int = 8,
) -> dict:
    """Drive a resumable backfill: pending = all buckets minus lineage-done;
    process `buckets_per_job` buckets per Spark job (one filter + one write),
    commit each batch's lineage afterwards.

    ``process_and_write(df_subset, bucket_list)`` runs the pipeline on the
    subset and writes the sinks idempotently for exactly those buckets.  It
    returns either ``(rows, tokens)`` batch totals, or a per-bucket dict
    ``{bucket: (rows, tokens)}`` for exact per-bucket lineage metrics.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    done = lineage.completed_buckets()
    pending = [b for b in range(n_buckets) if b not in done]
    stats = {"run_id": run_id, "skipped": len(done), "processed": 0,
             "rows": 0, "tokens": 0}
    for lo in range(0, len(pending), buckets_per_job):
        batch = pending[lo:lo + buckets_per_job]
        t0 = time.time()
        subset = df_bucketed.filter(F.col(BUCKET_COL).isin(batch))
        result = process_and_write(subset, batch)
        wall = time.time() - t0
        if isinstance(result, dict):
            for b in batch:
                r, t = result.get(b, (0, 0))
                lineage.commit(b, run_id=run_id, rows=r, tokens=t,
                               wall_sec=wall)
                stats["rows"] += r
                stats["tokens"] += t
        else:
            rows, tokens = result
            # batch totals: apportion across the committed buckets so the
            # persisted table SUMs to the true totals (remainder -> first)
            n = len(batch)
            for i, b in enumerate(batch):
                r = (rows or 0) // n + (1 if i < (rows or 0) % n else 0)
                t = (tokens or 0) // n + (1 if i < (tokens or 0) % n else 0)
                lineage.commit(b, run_id=run_id, rows=r, tokens=t,
                               wall_sec=wall)
            stats["rows"] += rows or 0
            stats["tokens"] += tokens or 0
        stats["processed"] += len(batch)
    return stats
