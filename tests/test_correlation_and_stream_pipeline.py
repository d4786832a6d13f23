"""esl correlation on the lifecycle generator + streaming flagship e2e."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pastash_spark import datagen
from pastash_spark.operators import correlate as C
from pastash_spark.operators import route as R
from pastash_spark.streaming import pipeline as SP


def test_esl_correlate_lifecycle(spark):
    ev = datagen.correlation_events(spark, 40).cache()
    try:
        out = {r.correlation_id: r for r in C.esl_correlate(ev).collect()}
        raw = ev.collect()
        calls = {}
        for r in raw:
            calls.setdefault(r.correlation_id, []).append(r)
        assert len(out) == 40
        for key, events in calls.items():
            names = {e.event_name for e in events}
            r = out[key]
            assert r.n_events == len(events)
            assert r.answered == ("CHANNEL_ANSWER" in names)
            assert r.destroyed_at is not None          # every call destroys
            assert r.duration_sec is not None and r.duration_sec > 0
            assert r.created_at == min(e.ts for e in events)
    finally:
        ev.unpersist()


def test_type_dispatch(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (64, "c"), (99, "d")],
                               "t int, v string")
    out = C.type_dispatch(
        df, "t",
        {1: F.concat(F.lit("session:"), F.col("v")),
         2: F.concat(F.lit("handle:"), F.col("v")),
         64: F.upper("v")},
        target="decoded", default=F.lit("unknown"))
    got = {r.t: r.decoded for r in out.collect()}
    assert got == {1: "session:a", 2: "handle:b", 64: "C", 99: "unknown"}


def test_app_janus_correlate_pairing_propagation(spark):
    """filter_app_janus.js:33-121 semantics on a hand-checked fixture:
    type-64 drop, type-128 session backfill via transport pairing, opaque
    propagation across the session, type-32 media ip/port enrichment with
    0.0.0.0/0 defaults."""
    rows = [
        (1, 1.0, 1, "s1", "t1", None, None, None),    # pair s1<->t1
        (2, 2.0, 2, "s1", None, "o1", None, None),    # pair s1->o1
        (3, 3.0, 128, None, "t1", None, "9.9.9.9", 5555),  # transport+ip
        (4, 4.0, 32, "s1", None, None, None, None),   # media -> enrich
        (5, 5.0, 64, "s1", None, None, None, None),   # dropped
        (6, 6.0, 32, "s2", None, None, None, None),   # no pairing -> defaults
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts double, type int, session_id string, "
              "transport_id string, opaque_id string, ip string, port int")
    out = {r.event_id: r for r in
           C.app_janus_correlate(df).orderBy("event_id").collect()}
    assert sorted(out) == [1, 2, 3, 4, 6]            # type 64 dropped
    assert out[3].session_id == "s1"                 # 128 backfilled via t1
    assert all(out[i].opaque_id == "o1" for i in (1, 2, 3, 4))
    assert (out[4].media_ip, out[4].media_port) == ("9.9.9.9", 5555)
    assert (out[6].media_ip, out[6].media_port) == ("0.0.0.0", 0)
    assert out[1].media_ip is None                   # only type 32 enriched


def test_streaming_flagship_counts_match_batch(spark, tmp_path):
    """Streaming and batch flagship must agree on per-sink counts — the
    routed-row equality invariant, streaming edition."""
    src = str(tmp_path / "landing")
    batch = datagen.token_sequences(spark, 1500).cache()
    try:
        # batch truth
        lookup = datagen.source_lookup(spark)
        from pastash_spark.plans import flagship
        want = {r.sink: (r.rows,) for r in
                R.sink_counts(flagship.build(batch, lookup)["routed"]).collect()}

        # land the same rows as NDJSON, run the stream to completion
        batch.coalesce(2).write.mode("overwrite").json(src)
        stream = SP.read_token_stream(spark, src)
        out = SP.build_stream(stream, lookup)
        q = SP.start_counts(out["sink_counts"], "stream_counts")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r.sink: (r.rows,) for r in spark.table("stream_counts").collect()}
        assert got == want
        assert sum(v[0] for v in got.values()) == 1500
    finally:
        batch.unpersist()


def test_streaming_fanout_sink_files(spark, tmp_path):
    src = str(tmp_path / "landing2")
    datagen.token_sequences(spark, 300).coalesce(1).write.mode("overwrite").json(src)
    lookup = datagen.source_lookup(spark)
    out = SP.build_stream(SP.read_token_stream(spark, src), lookup)
    q = SP.start_fanout(out["routed"], str(tmp_path / "sinks"),
                        str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(str(tmp_path / "sinks"))
    assert back.count() == 300
    assert set(r[R.ROUTE_COL] for r in back.select(R.ROUTE_COL).distinct().collect()) \
        <= {"errors", "quality", "code", "bulk"}
