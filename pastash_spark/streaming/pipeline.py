"""Streaming flagship pipeline: the same parse -> enrich -> route DAG as
plans/flagship.py over a Structured Streaming source.

paStash is inherently streaming (inputs push events through the chain,
lib/agent.js:244-282); the batch plan reuses unchanged because every stage
is an incremental-safe projection/broadcast-join — only the aggregates swap
to windowed/update-mode forms.  This module wires:

  file/json landing-zone source -> parse_stage -> enrich_stage -> route_stage
    -> per-sink partitioned file sink (append)
    -> per-sink running counts     (update-mode aggregate)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pastash_spark import datagen
from pastash_spark.operators import route as R
from pastash_spark.plans import flagship


def read_token_stream(spark: SparkSession, path: str,
                      fmt: str = "json") -> DataFrame:
    """Landing-zone incremental source (the streaming twin of the
    reference's glob-watched file tail, monitor_file.js:96-345 — offsets
    log replaces the byte-position db)."""
    schema = ("doc_id string, tokens array<int>, n_tok int, "
              "source string, raw string")
    reader = spark.readStream.schema(schema)
    return reader.json(path) if fmt == "json" else reader.parquet(path)


def build_stream(stream: DataFrame, lookup: DataFrame) -> dict[str, DataFrame]:
    """Same stages as the batch flagship — parse/enrich/route are stateless
    so they apply to a streaming DataFrame unchanged."""
    parsed = flagship.parse_stage(stream)
    enriched = flagship.enrich_stage(parsed, lookup)
    routed = flagship.route_stage(enriched)
    counts = (routed.groupBy(F.col(R.ROUTE_COL).alias("sink"))
              .agg(F.count("*").alias("rows"),
                   F.sum("n_tok").alias("tokens")))
    return {"routed": routed, "sink_counts": counts}


def start_fanout(routed: DataFrame, base_path: str, checkpoint: str):
    """Per-sink partitioned append sink with exactly-once file semantics
    (checkpointed offsets + idempotent file naming — the durable version of
    the reference's per-path writer cache, output_file.js:30-105)."""
    return (routed.writeStream
            .format("parquet")
            .option("path", base_path)
            .option("checkpointLocation", checkpoint)
            .partitionBy(R.ROUTE_COL)
            .outputMode("append")
            .start())


def start_counts(counts: DataFrame, query_name: str):
    """Running per-sink counts to an in-memory table (update mode) — the
    live analogue of the baseline's routed-row equality check."""
    return (counts.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .start())
