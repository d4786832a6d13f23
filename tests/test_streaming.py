"""Structured Streaming stateful-operator tests (memory sink, availableNow/
processAllAvailable) — streaming twins of multiline/cacheloop/lru."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pastash_spark.streaming.state import (
    cacheloop_stream, lru_state_stream, multiline_stream)


def _drain(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def test_cacheloop_stream_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    # two bursts for key k1 separated by > gap, one for k2; a final late
    # burst far in the future advances the watermark so earlier sessions emit
    import os
    os.makedirs(src)
    spark.createDataFrame(
        [("2024-01-01 00:00:00", "k1", 10.0),
         ("2024-01-01 00:00:05", "k1", 20.0),
         ("2024-01-01 00:10:00", "k1", 30.0),
         ("2024-01-01 00:00:01", "k2", 5.0)],
        "ts_s string, correlation_id string, metric double") \
        .coalesce(1).write.mode("overwrite").json(src)

    stream = (spark.readStream
              .schema("ts_s string, correlation_id string, metric double")
              .json(src)
              .withColumn("ts", F.to_timestamp("ts_s")))
    out = cacheloop_stream(stream, key="correlation_id", ts="ts",
                           gap="30 seconds", watermark="0 seconds",
                           avg_fields=["metric"])
    q = (out.writeStream.format("memory").queryName("cl_out")
         .outputMode("append").start())
    q.processAllAvailable()
    # second batch pushes watermark past the first sessions
    spark.createDataFrame(
        [("2024-01-01 09:00:00", "k9", 1.0)],
        "ts_s string, correlation_id string, metric double") \
        .coalesce(1).write.mode("append").json(src)
    _drain(q)

    rows = {(r.extract, str(r.session_start)): r
            for r in spark.table("cl_out").collect()}
    k1a = rows[("k1", "2024-01-01 00:00:00")]
    assert k1a["count"] == 2 and k1a.avg_metric == 15.0
    k1b = rows[("k1", "2024-01-01 00:10:00")]
    assert k1b["count"] == 1 and k1b.avg_metric == 30.0
    assert rows[("k2", "2024-01-01 00:00:01")]["count"] == 1


def test_lru_state_stream_set_get(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("k", 1, "set", "v1"), ("k", 2, "get", None),
         ("k", 3, "set", "v2"), ("k", 4, "get", None),
         ("j", 1, "get", None)],
        "key string, seq long, action string, value string") \
        .coalesce(1).write.mode("overwrite").json(src)
    stream = (spark.readStream
              .schema("key string, seq long, action string, value string")
              .json(src))
    out = lru_state_stream(stream, key="key", ttl_ms=60_000)
    q = (out.writeStream.format("memory").queryName("lru_out")
         .outputMode("append").start())
    _drain(q)
    got = {(r.key, r.seq): r.got for r in spark.table("lru_out").collect()}
    assert got[("k", 2)] == "v1"
    assert got[("k", 4)] == "v2"
    assert got[("j", 1)] is None       # get with nothing set


def test_multiline_stream_flush_on_start_line(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("h", 1, "START alpha"), ("h", 2, " cont-a"),
         ("h", 3, "START beta"), ("h", 4, " cont-b")],
        "key string, seq long, message string") \
        .coalesce(1).write.mode("overwrite").json(src)
    stream = (spark.readStream
              .schema("key string, seq long, message string").json(src))
    out = multiline_stream(stream, key="key", order="seq",
                           start_line_regex="^START", max_delay_ms=200)
    q = (out.writeStream.format("memory").queryName("ml_out")
         .outputMode("append").start())
    q.processAllAvailable()
    # a second micro-batch after the idle timeout flushes the tail buffer
    time.sleep(0.5)
    spark.createDataFrame([("z", 9, "START zeta")],
                          "key string, seq long, message string") \
        .coalesce(1).write.mode("append").json(src)
    q.processAllAvailable()
    time.sleep(0.5)
    spark.createDataFrame([("z2", 10, "START omega")],
                          "key string, seq long, message string") \
        .coalesce(1).write.mode("append").json(src)
    _drain(q)
    msgs = {r.first_seq: r.message for r in spark.table("ml_out").collect()}
    assert msgs[1] == "START alpha\n cont-a"     # flushed by next start line
    assert msgs.get(3) == "START beta\n cont-b"  # flushed by idle timeout
