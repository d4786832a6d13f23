"""Correlation / sessionization / aggregation operators (SURVEY.md §2.3).

The reference keeps per-key mutable state in LRU / dirty-db stores and flushes
on timers (filter_esl.js:137-251, base_filter_buffer.js:11-57,
plugins/filters/cacheloop/filter_cacheloop.js:42-114).  Batch-Spark re-derives
the same outputs from ordered windows and groupBys — one shuffle on the
correlation key, partial aggregation map-side, no driver state.  Streaming
variants live in streaming/.
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    """Epoch seconds for TIMESTAMP or TIMESTAMP_NTZ columns (NTZ cannot cast
    to double directly in Spark 4; session TZ is pinned to UTC so the NTZ ->
    TZ hop is value-preserving)."""
    return c.cast("timestamp").cast("double")


def multiline(df: DataFrame, *, key: Sequence[str], order: str,
              start_line_regex: str, field: str = "message",
              joiner: str = "\n") -> DataFrame:
    """Stateful line reassembly (filter_multiline.js:27-33,
    base_filter_buffer.js:11-57): lines buffer per key until the next line
    matching ``start_line_regex`` begins a new logical message.

    Batch shape: running count of start-line matches over the ordered window
    is the message group id; concat_ws over collect_list rebuilds the message.
    Two shuffles max (window + groupBy share the key partitioning, so AQE
    reuses the exchange).  Time-based flush (max_delay) is arrival-time-only
    in the reference and has no batch meaning — the streaming variant uses a
    session window instead (SURVEY §7 hard-part b).
    """
    keys = list(key)
    w = (Window.partitionBy(*keys).orderBy(F.col(order))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.col(field).rlike(start_line_regex).cast("int")
    grouped = df.withColumn("_msg_grp", F.sum(start).over(w))
    return (grouped
            .groupBy(*keys, "_msg_grp")
            .agg(F.concat_ws(joiner, F.array_sort(
                     F.collect_list(F.struct(F.col(order).alias("o"),
                                             F.col(field).alias("m")))).getField("m"))
                 .alias(field),
                 F.min(order).alias(order),
                 F.count("*").alias("n_lines"))
            .drop("_msg_grp"))


def sessionize(df: DataFrame, *, key: str | Sequence[str], ts: str = "ts",
               gap_seconds: float = 1800.0,
               target: str = "session_id") -> DataFrame:
    """Gap-based session assignment: a new session starts when the time since
    the previous event on the same key exceeds ``gap_seconds``.

    This is the batch analogue of the reference's idle-eviction state
    (cacheloop maxAge, filter_cacheloop.js:94-97): running sum of
    new-session flags = session ordinal per key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(ts))
    prev = F.lag(F.col(ts)).over(w)
    new_sess = (prev.isNull() |
                (_epoch(F.col(ts)) - _epoch(prev) > gap_seconds)
                ).cast("int")
    run = (Window.partitionBy(*keys).orderBy(F.col(ts))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(target, F.sum(new_sess).over(run))


def forward_fill_correlation(df: DataFrame, *, key: str | Sequence[str],
                             order: str, value: str,
                             target: str = "correlation_id") -> DataFrame:
    """esl-style correlation-id propagation (filter_esl.js:144-204): the id
    captured at CHANNEL_CREATE is carried to every later event of the call —
    ``last(value) ignorenulls`` over the ordered key window."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (Window.partitionBy(*keys).orderBy(F.col(order))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(target, F.last(F.col(value), ignorenulls=True).over(w))


def bleg_correlation(df: DataFrame, *, key: str = "unique_id",
                     other_key: str = "other_leg_unique_id",
                     corr: str = "correlation_id") -> DataFrame:
    """B-leg resolution (filter_esl.js:144-154): an event without its own
    correlation id borrows the one stored under its other-leg key — a self
    equi-join on the leg key, last-value-wins."""
    legs = (df.filter(F.col(corr).isNotNull())
            .groupBy(key).agg(F.max(corr).alias("_bleg_corr")))
    joined = df.join(legs.withColumnRenamed(key, other_key),
                     on=other_key, how="left")
    return (joined
            .withColumn(corr, F.coalesce(F.col(corr), F.col("_bleg_corr")))
            .drop("_bleg_corr"))


def cacheloop_aggregate(df: DataFrame, *, extract: str,
                        avg_fields: Sequence[str] = (),
                        collect: bool = True,
                        member_fields: Sequence[str] | None = None,
                        order: str | None = None,
                        custom_type: str | None = None,
                        rename_group: str = "group") -> DataFrame:
    """The cacheloop aggregation (plugins/filters/cacheloop/
    filter_cacheloop.js:42-97): one output row per ``extract`` key with
    ``count``, ``avg_<field>`` means, and the ordered member array
    (whitelist-projected via ``member_fields``).

    groupBy + partial aggregation — Catalyst plans map-side combine so the
    shuffle carries partial states, not rows; at 100 TB this is the only
    viable shape for a hot-key aggregate (plus AQE skew splitting for the
    collect_list, which cannot combine partially).
    """
    aggs: list[Column] = [F.count("*").alias("count")]
    for f in avg_fields:
        aggs.append(F.avg(F.col(f).cast("double")).alias(f"avg_{f}"))
    if collect:
        members = member_fields or [c for c in df.columns if c != extract]
        struct_cols = [F.col(c) for c in members]
        if order is not None:
            ordered = F.array_sort(F.collect_list(
                F.struct(F.col(order).alias("_o"), *struct_cols)))
            aggs.append(F.transform(
                ordered, lambda s: s.dropFields("_o")).alias(rename_group))
        else:
            aggs.append(F.collect_list(F.struct(*struct_cols)).alias(rename_group))
    out = df.groupBy(F.col(extract).alias("extract")).agg(*aggs)
    if custom_type:
        out = out.withColumn("type", F.lit(custom_type))
    return out


def salted_aggregate(df: DataFrame, *, key: str, aggs: dict[str, Column],
                     salt_buckets: int = 32) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates: partial
    aggregate on (key, salt) then final on key.  The north rule's explicit
    skew policy for the hot `source` value — a 40%-frequency key would
    otherwise pin one reducer.

    ``aggs`` maps output name -> (partial_expr, final stage is derived):
    supported values are F.count/F.sum/F.avg expressions declared by name:
      {"cnt": F.count("*"), "total": F.sum("x"), "mean": F.avg("x")}
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial_aggs, final_aggs = [], []
    for name, col in aggs.items():
        fn = col._jc.toString() if hasattr(col, "_jc") else str(col)
        if fn.startswith("count("):
            partial_aggs.append(col.alias(f"_p_{name}"))
            final_aggs.append(F.sum(f"_p_{name}").alias(name))
        elif fn.startswith("sum("):
            partial_aggs.append(col.alias(f"_p_{name}"))
            final_aggs.append(F.sum(f"_p_{name}").alias(name))
        elif fn.startswith("avg("):
            inner = fn[4:-1]
            partial_aggs.append(F.sum(inner).alias(f"_ps_{name}"))
            partial_aggs.append(F.count(inner).alias(f"_pc_{name}"))
            final_aggs.append((F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name))
        else:
            raise ValueError(f"salted_aggregate supports count/sum/avg, got {fn}")
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def esl_correlate(df: DataFrame, *, key: str = "correlation_id",
                  ts: str = "ts", event: str = "event_name",
                  metric: str = "metric") -> DataFrame:
    """FreeSWITCH-style call correlation (filter_esl.js:137-251) as one
    batch plan: per call key, propagate the id captured at CHANNEL_CREATE
    across the whole call (forward fill), mark answered/destroyed lifecycle
    state, and emit ONE summary row per call — created/answered/destroyed
    timestamps, duration, event count, avg metric.

    The reference mutates a persistent uuid.db per event (:174-204); here
    the same outputs derive from an ordered window + one groupBy — shuffle
    once on the call key.

    PERF note (r06): a pure one-groupBy formulation (answered_at =
    max(when(ANSWER, ts)) — the running-last forward fill is redundant for
    this summary) was tried and REVERTED: removing the window changed the
    order rows reach avg(metric), and at sf0.1 eleven calls' means land
    exactly on the 6-dp rounding boundary where the FP summation order
    decides the rounded value against the DuckDB oracle.  The (key, ts)
    ORDER is load-bearing for value parity, not just for the fill.
    PERF (r06b): the order is now produced by an explicit hash
    repartition + sortWithinPartitions(key, ts) — the exact exchange and
    sort spec the window ran — WITHOUT the Window operator's running-
    last() pass, whose outputs the summary never read (created_at is
    min(ts); max of a running-last of when(ANSWER, ts) == max of the
    when itself).  Rows reach every aggregate in the identical (key, ts)
    order, which scripts/check_oracle.py re-verifies at sf0.1 (the SF
    where the rounding ties live).
    """
    ordered = (df.repartition(F.col(key))
               .sortWithinPartitions(F.col(key), F.col(ts)))
    return (ordered.groupBy(key)
            .agg(F.min(ts).alias("created_at"),
                 F.max(F.when(F.col(event) == "CHANNEL_ANSWER",
                              F.col(ts))).alias("answered_at"),
                 F.max(F.when(F.col(event) == "CHANNEL_DESTROY", F.col(ts)))
                 .alias("destroyed_at"),
                 F.count("*").alias("n_events"),
                 F.avg(metric).alias("avg_metric"))
            .withColumn("answered", F.col("answered_at").isNotNull())
            .withColumn("duration_sec",
                        _epoch(F.col("destroyed_at"))
                        - _epoch(F.col("created_at"))))


def type_dispatch(df: DataFrame, type_col: str,
                  handlers: "dict[object, Column]",
                  target: str, default: Column | None = None) -> DataFrame:
    """app_janus-style type-dispatched handling (filter_app_janus.js:34-121):
    the per-type handler table becomes one mutually-exclusive CASE column —
    evaluated once per row instead of a JS handler lookup per event."""
    expr = None
    for tval, col in handlers.items():
        cond = F.col(type_col) == tval
        expr = F.when(cond, col) if expr is None else expr.when(cond, col)
    if default is not None:
        expr = expr.otherwise(default)
    return df.withColumn(target, expr)


def app_janus_correlate(df: DataFrame, *, ts: str = "ts",
                        order: str = "event_id") -> DataFrame:
    """Janus WebRTC event correlation (filter_app_janus.js:33-121):
    session_id <-> transport_id <-> opaque_id pairing propagation with
    type-32 media ip/port enrichment.

    Reference semantics, re-expressed relationally:
      * type 64 events are dropped outright (:94-95)
      * type 1 (session create/destroy) publishes both pairing directions:
        session -> transport and transport -> session (:64-79 GunDB puts)
      * type 2 publishes session -> opaque_id (:83-88)
      * type 128 (transport events, no native session_id) backfills
        session_id via the transport pairing and publishes the transport's
        ip/port (:96-108)
      * type 32 (media) rows enrich with ip/port resolved through
        session -> transport -> ip/port, defaulting '0.0.0.0'/0 (:110-119)

    The GunDB key-value store becomes three PAIRING DIMENSIONS derived by
    aggregation (latest write per key wins — deterministic (ts, order)
    tie-break).  Join strategy is left to Catalyst/AQE on purpose: the dims
    are O(#sessions)/O(#transports) — far smaller than the event stream but
    NOT constant-size, so a forced broadcast would OOM at 10^10 sessions
    while AQE's runtime SMJ->BHJ conversion still broadcasts them whenever
    they fit.  A batch replay reads the FINAL pairing value (the
    processing-time analogue of the reference's live GunDB reads).

    Expects columns: ``type`` (int), ``session_id``, ``transport_id``,
    ``opaque_id``, ``ip``, ``port``, plus ts/order for recency.
    Adds/fills: session_id (type-128 backfill), opaque_id (propagated per
    session), media_ip/media_port (type 32 only).
    """
    # PERF (r06): latest-write-wins as max_by over the (ts, order) struct
    # instead of a row_number sort-window — a hash aggregate with
    # map-side partial combine (no per-key sort, ~|keys| rows cross the
    # exchange instead of every event).  (ts, order) is the same
    # deterministic recency key the window ordered by; struct comparison
    # is lexicographic, so the selected row is identical.
    # PERF (r06b): the four pairing dims collapse into TWO keyed
    # aggregations (session-keyed and transport-keyed) with CONDITIONAL
    # max_by per value — max_by ignores rows whose ordering expression is
    # null, so when(type==.., recency) reproduces each original filtered
    # dim exactly (a key with no qualifying rows yields null, which the
    # downstream coalesces treat identically to the old left-join miss).
    # 2 source scans + 2 exchanges instead of 4+4; the opaque and media
    # lookups share ONE join of the merged session dim (the media values
    # were already consumed only under when(type==32)).
    live = df.filter(F.col("type") != 64)
    recency = F.struct(F.col(ts).alias("_t"), F.col(order).alias("_o"))
    typ = F.col("type")
    t1_ok = ((typ == 1) & F.col("session_id").isNotNull()
             & F.col("transport_id").isNotNull())
    t2_ok = ((typ == 2) & F.col("session_id").isNotNull()
             & F.col("opaque_id").isNotNull())
    t128_ok = ((typ == 128) & F.col("transport_id").isNotNull()
               & F.col("ip").isNotNull())
    sess_dims = (live.filter(t1_ok | t2_ok)
                 .groupBy("session_id")
                 .agg(F.max_by(F.col("transport_id"),
                               F.when(t1_ok, recency)).alias("_mtr"),
                      F.max_by(F.col("opaque_id"),
                               F.when(t2_ok, recency)).alias("_op"))
                 .withColumnRenamed("session_id", "_sd_sess"))
    tr_dims = (live.filter(t1_ok | t128_ok)
               .groupBy("transport_id")
               .agg(F.max_by(F.col("session_id"),
                             F.when(t1_ok, recency)).alias("_bf_session"),
                    F.max_by(F.col("ip"),
                             F.when(t128_ok, recency)).alias("_tip"),
                    F.max_by(F.col("port"),
                             F.when(t128_ok, recency)).alias("_tport")))
    tr_bf = tr_dims.select(F.col("transport_id").alias("_bf_tr"),
                           "_bf_session")
    tr_ip = tr_dims.select(F.col("transport_id").alias("_ip_tr"),
                           "_tip", "_tport")

    out = (live
           # type-128 session backfill through the transport pairing
           .join(tr_bf,
                 (F.col("type") == 128) &
                 (F.col("transport_id") == F.col("_bf_tr")), "left")
           .withColumn("session_id", F.coalesce("session_id", "_bf_session"))
           .drop("_bf_tr", "_bf_session")
           # opaque propagation + media transport per (possibly
           # backfilled) session, one join: _mtr is only read under
           # when(type==32), so attaching it to every matching session is
           # value-identical to the old type-32-gated join
           .join(sess_dims,
                 F.col("session_id") == F.col("_sd_sess"), "left")
           .withColumn("opaque_id", F.coalesce("opaque_id", "_op"))
           .withColumn("_mtr32", F.when(F.col("type") == 32, F.col("_mtr")))
           .drop("_sd_sess", "_op", "_mtr")
           # media enrichment: session -> transport -> ip/port
           .join(tr_ip,
                 F.col("_mtr32") == F.col("_ip_tr"), "left")
           .withColumn("media_ip",
                       F.when(F.col("type") == 32,
                              F.coalesce("_tip", F.lit("0.0.0.0"))))
           .withColumn("media_port",
                       F.when(F.col("type") == 32,
                              F.coalesce(F.col("_tport").cast("int"),
                                         F.lit(0))))
           .drop("_mtr32", "_ip_tr", "_tip", "_tport"))
    return out


def app_sonus_reassemble(df: DataFrame, *, source: str = "path",
                         order: str = "line_no", field: str = "message",
                         corr_regex: str = r"Call-ID: (\S+)") -> DataFrame:
    """Sonus SBC log correlation (filter_app_sonus.js:35-101): multiline SIP
    reassembly + carried context.  The reference keeps a module-level
    `ipcache` updated by "sending from"/"Incoming message" lines (:31-57)
    and buffers payload lines until a blank line flushes (:59-68); the
    correlation id is regex-extracted from the reassembled Call-ID header
    (:92-95).

    Batch shape: forward-fill the last-seen direction line per source
    (the ipcache), group payload lines by running blank-line count, emit
    one row per message with the extracted correlation_id.
    """
    w = (Window.partitionBy(source).orderBy(F.col(order))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    direction = F.when(
        F.col(field).rlike("sending from|Incoming message"), F.col(field))
    ctx = df.withColumn("_dir", F.last(direction, ignorenulls=True).over(w))
    # blank line closes a message; running count of blanks = message group
    grp = F.sum((F.trim(F.col(field)) == "").cast("int")).over(w)
    grouped = (ctx.withColumn("_grp", grp)
               .filter(F.trim(F.col(field)) != "")
               .filter(~F.col(field).rlike("sending from|Incoming message")))
    return (grouped.groupBy(source, "_grp")
            .agg(F.concat_ws("\n", F.array_sort(F.collect_list(
                     F.struct(F.col(order).alias("o"),
                              F.col(field).alias("m")))).getField("m"))
                 .alias("payload"),
                 F.first("_dir").alias("rcinfo"),
                 F.min(order).alias(order))
            .withColumn("correlation_id",
                        F.regexp_extract("payload", corr_regex, 1))
            .drop("_grp"))


def _device_key(df: DataFrame, key, op: str) -> list:
    """Resolve a reassembly operator's partition key SCALE-SAFELY
    (VERDICT r05 #3): ``None`` (the default) auto-detects the natural
    per-device column (``path``/``source``/``host``) so the default plan
    never ships a single-partition global sort; an explicit ``key=()``
    opts into the reference's one-agent global stream (faithful, but one
    task sorts everything — the scale-killer BENCH.md documents)."""
    if key is not None:
        return list(key)
    for cand in ("path", "source", "host"):
        if cand in df.columns:
            return [cand]
    raise ValueError(
        f"{op}: no per-device partition column (path/source/host) found — "
        "pass key=['<device-col>'] to partition the reassembly stream, or "
        "key=() to explicitly opt into the reference's single-stream "
        "global window (does not scale)")


# --- app_janus_sip ------------------------------------------------------------


def app_janus_sip_correlate(df: DataFrame, *, order: str = "event_id",
                            ts: str = "ts_us") -> DataFrame:
    """Janus SIP-plugin event -> SIP/HEP (plugins/filters/app_janus_sip/
    filter_app_janus_sip.js:41-155).  Two cache dims re-expressed as
    latest-wins joins:

      * type 128 ``connected`` publishes websocket id -> client ip
        (:52-56);
      * type 1 with event.transport.id resolves the websocket ip onto the
        session (:57-66; like the reference, a session whose websocket
        never connected carries a NULL ip);
      * rows with event.data.sip parse Via host/port/rport + Call-ID from
        the raw message (parsip's fields the addressing actually uses);
        a session with NO cache entry infers {ip, port} from its FIRST
        SIP event's Via and keeps it (:97-104 cache.set) — a per-session
        first() window;
      * ``sip-out``: src = session ip:port (5050 fallbacks), dst = Via
        host:port; ``sip-in``: src = Via host:port, dst = session ip with
        the Via ``rport`` (:115-147).  time_sec = ts/1e6; time_usec
        mirrors the reference's (ts/1000)%1000 millisecond slice exactly
        (a documented reference quirk — NOT true microseconds).

    Expects columns: type int, ``session_id``, ``ws_id`` (event.id /
    event.transport.id), ``ws_event`` (event.data.event), ``ws_ip``
    (event.data.ip), ``sip`` (raw event.data.sip), `order`, `ts` (Janus
    micros).  Output: one HEP row per SIP event."""
    t = F.col("type").cast("int")

    ws_dim = (df.filter((t == 128) & (F.col("ws_event") == "connected")
                        & F.col("ws_id").isNotNull())
              .select(F.col("ws_id").alias("_w_id"),
                      F.col("ws_ip").alias("_w_ip"),
                      F.col(order).alias("_w_o")))
    w_ws = Window.partitionBy("_w_id").orderBy(F.col("_w_o").desc())
    ws_dim = (ws_dim.withColumn("_rn", F.row_number().over(w_ws))
              .filter(F.col("_rn") == 1).select("_w_id", "_w_ip"))

    sess_pub = (df.filter((t == 1) & F.col("ws_id").isNotNull()
                          & F.col("session_id").isNotNull())
                .select(F.col("session_id").alias("_s_id"),
                        F.col("ws_id").alias("_s_ws"),
                        F.col(order).alias("_s_o")))
    w_sess = Window.partitionBy("_s_id").orderBy(F.col("_s_o").desc())
    sess_dim = (sess_pub.withColumn("_rn", F.row_number().over(w_sess))
                .filter(F.col("_rn") == 1)
                .join(ws_dim, F.col("_s_ws") == F.col("_w_id"), "left")
                .select("_s_id", F.col("_w_ip").alias("_sess_ip")))

    sip_raw = F.col("sip").cast("string")
    via_re = r"(?im)^(?:Via|v)\s*:\s*SIP/2\.0/\w+\s+([^;:\s]+)(?::([0-9]+))?"
    via_host = F.regexp_extract(sip_raw, via_re, 1)
    via_port = F.regexp_extract(sip_raw, via_re, 2).try_cast("int")
    rport = F.regexp_extract(sip_raw, r"(?i);rport=([0-9]+)", 1) \
        .try_cast("int")
    callid = F.regexp_extract(sip_raw,
                              r"(?im)^(?:Call-ID|i)\s*:\s*(\S+)", 1)
    sips = (df.filter(sip_raw.isNotNull() & (sip_raw != "")
                      & F.col("session_id").isNotNull())
            .select(F.col(order), F.col(ts).cast("long").alias("_ts"),
                    F.col("session_id"), sip_raw.alias("payload"),
                    F.col("ws_event").alias("_ev"),
                    via_host.alias("_vh"), via_port.alias("_vp"),
                    rport.alias("_vr"), callid.alias("_cid")))
    # cache-miss inference: the session adopts its FIRST SIP event's Via
    w_first = (Window.partitionBy("session_id").orderBy(F.col(order))
               .rowsBetween(Window.unboundedPreceding, 0))
    sips = (sips.withColumn("_inf_ip", F.first("_vh", True).over(w_first))
            .withColumn("_inf_port", F.first("_vp", True).over(w_first))
            .join(sess_dim, F.col("session_id") == F.col("_s_id"), "left"))
    has_dim = F.col("_s_id").isNotNull()
    sess_ip = F.when(has_dim, F.col("_sess_ip")) \
        .otherwise(F.col("_inf_ip"))
    sess_port = F.when(has_dim, F.lit(None).cast("int")) \
        .otherwise(F.col("_inf_port"))
    is_out = F.col("_ev") == "sip-out"
    is_in = F.col("_ev") == "sip-in"
    return (sips.filter(is_out | is_in)
            .select(
                F.col(order), F.col("session_id"),
                F.lit(1).alias("proto_type"),
                F.col("payload"),
                F.coalesce(F.col("_cid"), F.lit(""))
                .alias("correlation_id"),
                F.when(is_out,
                       F.coalesce(sess_ip, F.lit("127.0.0.1")))
                .otherwise(F.coalesce(F.col("_vh"), F.lit("127.0.0.1")))
                .alias("src_ip"),
                F.when(is_out, F.coalesce(sess_port, F.lit(5050)))
                .otherwise(F.coalesce(F.col("_vp"), F.lit(5050)))
                .cast("int").alias("src_port"),
                F.when(is_out,
                       F.coalesce(F.col("_vh"), F.lit("127.0.0.1")))
                .otherwise(sess_ip).alias("dst_ip"),
                F.when(is_out, F.coalesce(F.col("_vp"), F.lit(5050)))
                .otherwise(F.coalesce(F.col("_vr"), F.lit(5050)))
                .cast("int").alias("dst_port"),
                F.lit(17).alias("protocol"),
                F.floor(F.col("_ts") / 1000000).cast("long")
                .alias("ts_sec"),
                F.floor((F.col("_ts") / 1000) % 1000).cast("long")
                .alias("ts_usec")))


# --- app_genesys --------------------------------------------------------------


def app_genesys_correlate(df: DataFrame, *, field: str = "message",
                          order: str = "line_no",
                          correlation_hdr: str | None = None) -> DataFrame:
    """Genesys SIP Server log -> SIP/HEP (plugins/filters/app_genesys/
    filter_app_genesys.js:33-130).  The reference's LRU pairs
    ``CID:CUUID><callid>:<uuid>`` publications both ways; SIPTR
    Received / ``Sending  [`` blocks emit SIP payloads whose correlation
    id prefers the session UUID, and ``event: message`` log lines
    resolve their CallUUID back to proto_type 100 rows:

      * Received head ``Received [t,u] N bytes from IP:PORT `` -> src =
        remote, dst = local; Sending mirrors (:88-95 rcv ternaries);
      * local ip = the Call-ID's ``@host`` part (127.0.0.1 fallback),
        local port = the first ``<host>:<port>>`` match in the payload
        (5060 fallback, :55-58);
      * payload = the block minus its first (head) line, first LF -> CRLF
        (the reference replaces only the first, :52);
      * correlation id = LRU uuid for the Call-ID when published, else
        the Call-ID (:119-122; the cached correlation overrides even the
        correlation_hdr extract).

    Batch re-expression: the CID:CUUID LRU becomes a latest-wins pairing
    dim joined on Call-ID (AQE picks broadcast when it fits — same
    rationale as app_janus_correlate's dims).  Output: (`order`, payload,
    correlation_id, proto_type, src_ip, src_port, dst_ip, dst_port,
    protocol)."""
    msg = F.col(field).cast("string")
    ord_c = F.col(order)

    # pairing dim: CID:CUUID><callid>:<uuid> (:42-47), latest wins
    cid_pub = F.split(F.get(F.split(msg, ">"), 1), ":")
    pubs = (df.filter(msg.contains("CID:CUUID>"))
            .select(F.get(cid_pub, 0).alias("_cid"),
                    F.get(cid_pub, 1).alias("_uuid"),
                    ord_c.alias("_po"))
            .filter(F.col("_cid").isNotNull()
                    & F.col("_uuid").isNotNull()))
    w_pub = Window.partitionBy("_cid").orderBy(F.col("_po").desc())
    pubs = (pubs.withColumn("_rn", F.row_number().over(w_pub))
            .filter(F.col("_rn") == 1).select("_cid", "_uuid"))

    rcv_re = r"Received \[(.*),(.*)\] (.*) bytes from (.*):(.*) "
    snd_re = r"Sending  \[(.*),(.*)\] (.*) bytes to (.*):(.*) "
    is_rcv = msg.contains("SIPTR: Received")
    is_snd = ~is_rcv & msg.contains(": Sending  [")
    head = F.get(F.split(msg, "\n"), 0)
    body = F.regexp_replace(msg, r"^[^\n]*\n", "")
    # reference :52: only the FIRST \n of the body becomes \r\n (the JS
    # string-arg .replace — which doubles the \r on an already-CRLF
    # body); [^\n] not ``.`` because Java's dot excludes \r too
    payload = F.regexp_replace(body, r"^([^\n]*)\n", "$1\r\n")
    callid = F.regexp_extract(payload, r"Call-ID: (.*)\r", 1)
    callid = F.when(callid != "", callid).otherwise("false@127.0.0.1")
    local_ip = F.coalesce(F.get(F.split(callid, "@"), 1),
                          F.lit("127.0.0.1"))
    # first '<localIp>:<port>>' occurrence (the reference builds a
    # per-row RegExp from localIp, :56 — Spark patterns must be literal,
    # so match every host:port> pair and pick the one whose host segment
    # ends with the local ip; URI userinfo like 'a@' glues onto the host
    # charset, hence endswith rather than equality)
    hp_re = F.lit(r"([^\s<:>]+):([0-9]+)>")
    hp = F.arrays_zip(
        F.regexp_extract_all(payload, hp_re, F.lit(1)).alias("h"),
        F.regexp_extract_all(payload, hp_re, F.lit(2)).alias("p"))
    mine = F.filter(hp, lambda x: x["h"].endswith(local_ip))
    local_port = F.coalesce(F.get(mine, 0)["p"], F.lit("5060"))

    def rc(rx, i):
        return F.regexp_extract(head, rx, i)

    sip = (df.filter(is_rcv | is_snd)
           .select(ord_c, F.lit(1).alias("proto_type"),
                   payload.alias("payload"), callid.alias("_callid"),
                   is_rcv.alias("_rcv"),
                   F.when(is_rcv, rc(rcv_re, 4)).otherwise(rc(snd_re, 4))
                   .alias("_rip"),
                   F.when(is_rcv, rc(rcv_re, 5)).otherwise(rc(snd_re, 5))
                   .alias("_rport"),
                   F.when(is_rcv, rc(rcv_re, 2)).otherwise(rc(snd_re, 2))
                   .alias("_proto"),
                   local_ip.alias("_lip"), local_port.alias("_lport")))

    logs = (df.filter(msg.contains("event: message"))
            .select(ord_c, F.lit(100).alias("proto_type"),
                    msg.alias("payload"),
                    F.regexp_extract(msg, r"CallUUID\t'(.*)'\n", 1)
                    .alias("_uuid_log"))
            .filter(F.col("_uuid_log") != ""))

    # join strategy left to AQE like app_janus_correlate's dims: the
    # pairing dim is O(#calls), broadcastable when small but unbounded
    sip = sip.join(pubs, sip["_callid"] == pubs["_cid"], "left")
    corr = F.coalesce(F.col("_uuid"), F.col("_callid"))
    if correlation_hdr:
        xcid = F.trim(F.regexp_extract(
            F.col("payload"), correlation_hdr + r":\s?(.*)\r", 1))
        # LRU correlation overrides the header extract (:119-122)
        corr = F.coalesce(F.col("_uuid"),
                          F.when(xcid != "", xcid), F.col("_callid"))
    sip_out = sip.select(
        ord_c, "proto_type", "payload", corr.alias("correlation_id"),
        F.when(F.col("_rcv"), F.col("_rip")).otherwise(F.col("_lip"))
        .alias("src_ip"),
        F.when(F.col("_rcv"), F.col("_rport")).otherwise(F.col("_lport"))
        .try_cast("int").alias("src_port"),
        F.when(F.col("_rcv"), F.col("_lip")).otherwise(F.col("_rip"))
        .alias("dst_ip"),
        F.when(F.col("_rcv"), F.col("_lport")).otherwise(F.col("_rport"))
        .try_cast("int").alias("dst_port"),
        F.when(F.col("_proto") == "UDP", 17).otherwise(6)
        .alias("protocol"))
    # log lines: resolve uuid (their correlation IS the uuid; :76-86
    # emits rc [0,'UDP',...] localhost addressing)
    log_out = logs.select(
        ord_c, "proto_type", "payload",
        F.col("_uuid_log").alias("correlation_id"),
        F.lit("127.0.0.1").alias("src_ip"),
        F.lit(0).cast("int").alias("src_port"),
        F.lit("127.0.0.1").alias("dst_ip"),
        F.lit(0).cast("int").alias("dst_port"),
        F.lit(17).alias("protocol"))
    return sip_out.unionByName(log_out)


# --- app_avaya ----------------------------------------------------------------


def app_avaya_correlate(df: DataFrame, *, field: str = "message",
                        order: str = "line_no",
                        key: "Sequence[str] | None" = None,
                        correlation_hdr: str | None = None) -> DataFrame:
    """Avaya SBC trace log -> SIP/HEP (plugins/filters/app_avaya/
    filter_app_avaya.js:34-96).  The reference buffers one ``SIPMSGT``
    block (``last``/``hold``), appends ``SIPMSGT+`` continuation lines to
    it, and RELEASES the buffer when the next ``SIPMSGT`` block arrives —
    the releasing block itself becomes the next buffer only when no
    emission happened (so block N emits at block N+1's arrival and the
    trigger is consumed: in a steady stream the ODD blocks emit).  Per
    released buffer: ``#012`` field split, ``split[0]`` timestamp
    (DD/MM/YYYY HH:mm:ss.SSS), ``split[2]`` local/remote datagram
    ``L<ip>:<port>/R<ip>:<port>/<proto>/``, optional ``split[3]`` egress
    remote overriding the destination, payload = the LAST field, optional
    correlation header extract.

    Batch re-expression: blocks rank per ``key`` partition; odd-ranked
    blocks (the held ones) emit when a later block exists, with their
    continuation lines' sanitized tails appended — a groupBy on the
    attached block id, no driver state."""
    key = _device_key(df, key, "app_avaya_correlate")
    msg = F.col("_m")
    is_cont = msg.contains("SIPMSGT+")
    is_block = ~is_cont & msg.contains("SIPMSGT #012")
    full = F.get(F.split(msg, r"SIPMSGT #012--------------------#012"), 1)
    # continuation sanitize + tail (reference :37-40)
    cont_tail = F.get(F.split(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(msg, "#015#012", "\r\n"),
                r">#012<", ">\n<"),
            r"#012--------------------", ""),
        r"SIPMSGT\+ "), 1)

    w = (Window.partitionBy(*key) if key else Window.partitionBy()) \
        .orderBy(F.col(order))
    base = (df.select(*key, F.col(order),
                      F.regexp_replace(F.col(field), r"\r\n", "#012")
                      .alias("_m"))
            .withColumn("_is_block", is_block)
            .withColumn("_is_cont", is_cont)
            .withColumn("_blk_ord",
                        F.last(F.when(is_block & full.isNotNull(),
                                      F.col(order)),
                               ignorenulls=True).over(w))
            .filter((F.col("_is_block") & full.isNotNull())
                    | F.col("_is_cont")))
    pieces = F.when(F.col("_is_block"), full).otherwise(cont_tail)
    grouped = (base
               .withColumn("_piece", pieces)
               .groupBy(*key, "_blk_ord")
               .agg(F.concat_ws(
                   "", F.array_sort(F.collect_list(
                       F.struct(F.col(order).alias("o"),
                                F.col("_piece").alias("p")))).getField("p"))
                   .alias("_buf")))
    w_blk = (Window.partitionBy(*key) if key else Window.partitionBy()) \
        .orderBy(F.col("_blk_ord"))
    ranked = (grouped
              .withColumn("_rk", F.row_number().over(w_blk))
              .withColumn("_n", F.count("*").over(
                  Window.partitionBy(*key) if key
                  else Window.partitionBy())))
    emit = ranked.filter((F.col("_rk") % 2 == 1)
                         & (F.col("_rk") < F.col("_n")))

    buf = F.regexp_replace(
        F.regexp_replace(F.col("_buf"), "#015#012", "\r\n"),
        r"#011|-->|<--|#012--------------------", "")
    parts = F.split(buf, "#012")
    dt = F.try_to_timestamp(F.get(parts, 0),
                            F.lit("dd/MM/yyyy HH:mm:ss.SSS"))
    sec = dt.cast("double")
    dg_re = r"L(.*):(.*[0-9])/R(.*):(.*[0-9])/(.*)/"
    local = F.get(parts, 2)
    egress = F.get(parts, 3)

    def g(src, i):
        v = F.regexp_extract(src, dg_re, i)
        return F.when(v != "", v)

    sip = F.element_at(parts, -1)
    corr = (F.trim(F.regexp_extract(
        sip, correlation_hdr + r":\s?(.*)\r", 1))
        if correlation_hdr else F.lit(""))
    return emit.select(
        F.col("_blk_ord").alias(order),
        sip.alias("payload"),
        corr.alias("correlation_id"),
        g(local, 3).alias("src_ip"),
        g(local, 4).try_cast("int").alias("src_port"),
        F.coalesce(g(egress, 3), g(local, 1)).alias("dst_ip"),
        F.coalesce(g(egress, 4), g(local, 2)).try_cast("int")
        .alias("dst_port"),
        F.when(g(local, 5) == "UDP", 17).otherwise(6).alias("protocol"),
        F.lit(1).alias("proto_type"),
        F.floor(sec).cast("long").alias("ts_sec"),
        F.round((sec - F.floor(sec)) * 1000000).cast("long")
        .alias("ts_usec"))


# --- app_ingate / app_cisco ---------------------------------------------------


def app_ingate_correlate(df: DataFrame, *, field: str = "message",
                         order: str = "line_no", ts: str | None = None,
                         key: "Sequence[str] | None" = None,
                         correlation_hdr: str =
                         r"(?:[Cc]all-[Ii][Dd]:|i:)") -> DataFrame:
    """Ingate SIParator firewall log -> SIP/HEP assembly
    (plugins/filters/app_ingate/filter_app_ingate.js:52-230).  The
    reference's module-global ``ipcache`` carries the last egress/ingress
    addressing onto the following indented SIP block:

      * ``send s[fl] ... to A:p via B:q PROTO connection N:`` (egress,
        :67) publishes src=B:q (via), dst=A:p, proto;
      * ``recv from A:p via B:q PROTO connection N:`` (ingress, :92)
        publishes src=A:p, dst=B:q, proto;
      * an (already multiline-reassembled) block containing 8+ spaces and
        ``SIP/2.0`` re-assembles the SIP payload: per inner line, the
        ``:\\s{14}(.*)$`` capture joins with CRLF, a bare trailing ``:``
        after the 3rd line contributes the blank SDP separator line, and
        ``Debug: sipfw:|Info: sipfw:`` past line 3 bails out (:135-160).
        The block emits payload + the forward-filled rcinfo (proto_type 1,
        protocol UDP->17 else 6) and the Call-ID/i: correlation id.

    Batch re-expression: address publications forward-fill over a
    ``key``-partitioned window (one device per partition; the reference
    is one-agent-global) — same shape as app_sonus.  Output: one row per
    SIP block — (`order`, payload, correlation_id, src_ip, src_port,
    dst_ip, dst_port, protocol[, ts])."""
    key = _device_key(df, key, "app_ingate_correlate")
    msg = F.col(field).cast("string")
    send_re = (r"send\ss[fl](?:\s\(0x.*\))?\sto\s(.*):(.*)\svia\s"
               r"(.*):([^\s]+)\s(\w+)\sconnection\s\d+:")
    recv_re = (r"(?i)recv\sfrom\s(.*):(.+)\svia\s(.*):(.+)\s(\w+)\s"
               r"connection\s\d+:")
    is_send = msg.contains("send s")
    is_recv = ~is_send & msg.contains("recv")

    def g(rx, i):
        v = F.regexp_extract(msg, rx, i)
        return F.when(v != "", v)

    pub = F.when(is_send, F.struct(
        g(send_re, 3).alias("sip_"), g(send_re, 4).alias("sport"),
        g(send_re, 1).alias("dip"), g(send_re, 2).alias("dport"),
        g(send_re, 5).alias("proto"))) \
        .when(is_recv, F.struct(
            g(recv_re, 1).alias("sip_"), g(recv_re, 2).alias("sport"),
            g(recv_re, 3).alias("dip"), g(recv_re, 4).alias("dport"),
            g(recv_re, 5).alias("proto")))
    base = df.withColumn("_pub", pub)
    w = (Window.partitionBy(*key) if key else Window.partitionBy()) \
        .orderBy(F.col(order))
    filled = F.last("_pub", ignorenulls=True).over(w)
    cols = [F.col(order)]
    if ts:
        cols.append(F.col(ts))
    base = base.select(*cols, msg.alias("_m"), filled.alias("_rc"))

    @F.pandas_udf("string")
    def assemble(s: pd.Series) -> pd.Series:
        line_re = re.compile(r"(?::\s{14}(.*)|(:))$")
        bail_re = re.compile(r"Debug: sipfw:|Info: sipfw:")

        def one(v):
            if v is None:
                return None
            out = []
            for i, ln in enumerate(v.split("\n")):
                if i > 2 and bail_re.search(ln):
                    break
                m = line_re.search(ln)
                if m and m.group(1) is not None:
                    out.append(m.group(1) + "\r\n")
                elif i > 2 and m and m.group(2) is not None:
                    out.append("\r\n")
            return "".join(out)
        return s.map(one)

    sip_block = (base.filter(F.col("_m").contains("        ")
                             & (F.col("_m").contains(" SIP/2.0")
                                | F.col("_m").contains("SIP/2.0 ")))
                 .withColumn("_sip", assemble(F.col("_m"))))
    corr = F.regexp_extract(F.col("_sip"),
                            correlation_hdr + r"\s?(.*?)\r?\n", 1)
    out_cols = [
        F.col(order), F.col("_sip").alias("payload"),
        F.trim(corr).alias("correlation_id"),
        F.col("_rc.sip_").alias("src_ip"),
        F.col("_rc.sport").try_cast("int").alias("src_port"),
        F.col("_rc.dip").alias("dst_ip"),
        F.col("_rc.dport").try_cast("int").alias("dst_port"),
        F.when(F.col("_rc.proto") == "UDP", 17).otherwise(6)
        .alias("protocol"),
        F.lit(1).alias("proto_type")]
    if ts:
        out_cols.append(F.col(ts))
    return sip_block.select(*out_cols)


def app_cisco_correlate(df: DataFrame, *, field: str = "message",
                        host: str = "host",
                        order: str = "line_no",
                        key: "Sequence[str] | None" = None) -> DataFrame:
    """Cisco ISR ``ccsipDisplayMsg`` log -> SIP/HEP assembly
    (plugins/filters/app_cisco/filter_app_cisco.js:86-160):

      * strip per-line syslog prefixes ``<pri>...: `` (:91-92);
      * Call-ID then x-cid (x-cid WINS when both present, :95-106);
      * ``Sent:`` -> src = the device host, dst = the From-URI host
        unless it equals the device (then the To-URI host);
        ``Received:`` mirrors (:119-147);
      * timestamp ``MMM [D]D HH:mm:ss.SSS`` -> epoch sec + usec
        (:149-156, moment semantics via try_to_timestamp — year-less,
        pinned to 1970 like a moment parse with no year context);
      * payload = cleaned block minus the ccsipDisplayMsg header line,
        with a CRLF terminator (:157-158).

    The reference's global ipcache persists missing fields across
    blocks — re-expressed as a forward-fill over a ``key``-partitioned
    window.  Its async ``dns.lookup`` FQDN resolution (:28-51, which
    races postProcess and indexes a string) is the reverse_dns operator's
    job — compose ``enrich.reverse_dns`` downstream when needed.
    Output: (`order`, host, payload, correlation_id, src_ip, dst_ip,
    ts_sec, ts_usec, proto_type=1)."""
    key = _device_key(df, key, "app_cisco_correlate")
    msg = F.col(field).cast("string")
    cleaned = F.regexp_replace(msg, r"<\d*>.*?(:\s|:)(\*|)", "")
    callid = F.regexp_extract(cleaned, r"(?m)Call-ID:\s(.*?)$", 1)
    xcid = F.regexp_extract(cleaned, r"(?m)x-cid:\s(.*?)$", 1)
    cid = F.when(xcid != "", xcid).when(callid != "", callid)
    direction = F.regexp_extract(cleaned, r"(Sent|Received):", 1)
    from_ip = F.regexp_extract(
        cleaned, r'From:\s(?:".*?"\s|)<sip:(?:.*?@|)(.*?)>;', 1)
    to_ip = F.regexp_extract(cleaned, r"To: <sip:(?:.*?@|)(.*?)>", 1)
    dev = F.col(host).cast("string")
    other = F.when((from_ip != "") & (from_ip != dev), from_ip) \
        .when(to_ip != "", to_ip)
    src = F.when(direction == "Sent", dev) \
        .when(direction == "Received", other)
    dst = F.when(direction == "Sent", other) \
        .when(direction == "Received", dev)
    date_s = F.regexp_extract(
        cleaned,
        r"([A-Za-z]{3}\s{1,2}\d{1,2}\s\d{2}:\d{2}:\d{2}\.\d+)", 1)
    dt = F.try_to_timestamp(F.when(date_s != "", date_s),
                            F.lit("MMM [ ]d HH:mm:ss.SSS"))
    ts_sec = dt.cast("double")
    payload = F.concat(F.regexp_replace(
        cleaned,
        r"^[A-Za-z]{3}\s{1,2}\d{1,2}\s\d{2}:\d{2}:\d{2}\.\d+.*?:"
        r"\s.*SIP/Msg/ccsipDisplayMsg:\n(Sent|Received):\n", ""),
        F.lit("\r\n"))

    base = df.withColumn("_f", F.struct(
        F.when(cid.isNotNull(), cid).alias("cid"),
        F.when(src.isNotNull() & (src != ""), src).alias("src"),
        F.when(dst.isNotNull() & (dst != ""), dst).alias("dst"),
        ts_sec.alias("tsec")))
    w = (Window.partitionBy(*key) if key else Window.partitionBy()) \
        .orderBy(F.col(order))

    def ff(name):
        return F.last(F.col("_f." + name), ignorenulls=True).over(w)

    sec = ff("tsec")
    return base.select(
        F.col(order), dev.alias("host"), payload.alias("payload"),
        F.coalesce(ff("cid"), F.lit("")).alias("correlation_id"),
        ff("src").alias("src_ip"), ff("dst").alias("dst_ip"),
        F.floor(sec).cast("long").alias("ts_sec"),
        F.round((sec - F.floor(sec)) * 1000000).cast("long")
        .alias("ts_usec"),
        F.lit(1).alias("proto_type"))


# --- janus trace/span assembly ------------------------------------------------

_JANUS_USER_EVENTS = ("joined", "configured", "published", "subscribing",
                      "subscribed", "updated", "unpublished", "leaving")


def janus_trace_spans(df: DataFrame, *, order: str = "event_id",
                      ts: str = "ts_us", session: str = "session_id",
                      types: Sequence[int] | None = None) -> DataFrame:
    """Janus event -> OTel-style trace/span assembly: the span-pairing
    kernel shared by plugins/filters/app_janus/filter_app_janus_tracer.js
    (:174-919, flat deterministic-id spans) and app_janus_uptrace/
    filter_app_janus_uptrace.js (:140-420, LRU-paired start/end spans with
    real durations).  We implement the uptrace PAIRING with the tracer's
    span NAMES/services — per session (the trace):

      * type 1 ``created`` OPENS the root ``Session`` span; ``destroyed``
        CLOSES it (uptrace :153-173 lru sess_*) and emits the point span
        ``Session destroyed``.
      * type 2 ``attached`` opens ``Handle attached`` (lru att_*, parent =
        Session); ``detached`` closes it + point ``Handle detached``.
      * type 8 jsep ``offer`` opens ``JSEP Event - Offer`` (lru sdp_*);
        owner ``local`` closes it + point ``JSEP Event - Answer``.
      * type 16 subtype 1 ``gathering`` opens ``ICE gathering`` (lru
        ice_*); ``connecting``/``connected`` are point children;
        ``ready`` closes it + point ``ICE ready``.  Subtypes 2/3/4 emit
        point children ``Local Candidate``/``Remote Candidate``/
        ``Selected Candidates``; subtype 5 ``DTLS trying``/``DTLS
        connected``; subtype 6 ``Connection Up`` — all parented to the
        open ICE span (tracer :447-566).
      * type 4 -> point ``External Event`` (service External); type 64
        data.event in joined/configured/published/subscribing/subscribed/
        updated/unpublished/leaving -> point ``User <event>`` (service
        Plugin) — both parented to the Session span (tracer :300-320,
        :698-814).
      * type 128 -> point ``Transport connected`` (service ``Transport
        Originated``); type 256 subtype 1/2 -> ``Startup``/``Shutdown``
        (service Core).  No session exists, so the trace key is the
        EMITTER.  Documented divergences: the tracer keys 128 on
        ``Math.random()`` (:636) — we key deterministically; its 256
        branch compares the stringified subtype with ``=== 1`` (:662-668)
        so it never actually emits — we implement the documented intent.

    Like the reference, a close without a live open pairs with the stale
    open (the LRU never deletes att_/sdp_/ice_ entries); an open that is
    never closed is never exported (the LRU span is dropped unflushed).
    Batch re-expression: ONE shuffle — a per-trace-key window forward-
    fills each family's open (order, ts), closes emit the paired span
    with its real duration plus their point span, via one array-explode.

    Deterministic ids (cross-engine-portable divergence, documented: the
    reference uses md5 for trace ids but shake256/random bytes for span
    ids — same determinism-or-uniqueness intent, different hash):
    trace_id = md5(trace_key); root span_id = md5(trace_key)[:16]; child
    span ids = md5(trace_key:family:order)[:16].

    Expects columns: ``type`` int, ``session_id``, ``order``/``ts``
    (BIGINT event time, e.g. Janus micros) plus the optional per-type
    string columns subtype(int)/event_name/jsep_type/jsep_owner/
    ice_state/dtls_state/data_event/emitter (missing ones read as NULL).
    Output: one row per span — (order, session_id, trace_id, span_id,
    parent_span_id, name, service, start_us, end_us, duration_us).
    Type 32 media METRICS are the tracer's prometheus half — covered by
    app_janus_correlate's enrichment, not spans."""
    cols = set(df.columns)

    def c(name: str, dtype: str = "string") -> Column:
        return (F.col(name).cast(dtype) if name in cols
                else F.lit(None).cast(dtype))

    t = F.col("type").cast("int")
    sub = c("subtype", "int")
    name_ev = c("event_name")
    jsep_type, jsep_owner = c("jsep_type"), c("jsep_owner")
    ice, dtls, data_ev = c("ice_state"), c("dtls_state"), c("data_event")
    emitter = c("emitter")
    if types is not None:
        df = df.filter(t.isin(*[int(x) for x in types]))

    tk = F.when(t.isin(128, 256), F.concat(F.lit("em:"), F.coalesce(
        emitter, F.lit("")))).otherwise(F.col(session).cast("string"))
    w = Window.partitionBy("_tk").orderBy(F.col(order))
    ts_c = F.col("_ts")

    open_sess = (t == 1) & (name_ev == "created")
    close_sess = (t == 1) & (name_ev == "destroyed")
    open_att = (t == 2) & (name_ev == "attached")
    close_att = (t == 2) & (name_ev == "detached")
    open_sdp = (t == 8) & (jsep_type == "offer")
    close_sdp = (t == 8) & (jsep_owner == "local")
    open_ice = (t == 16) & (sub == 1) & (ice == "gathering")
    close_ice = (t == 16) & (sub == 1) & (ice == "ready")

    def ffill(fam: int, val: Column) -> Column:
        return F.last(F.when(F.col("_ofl") == fam, val),
                      ignorenulls=True).over(w)

    ice16 = (t == 16) & sub.isin(2, 3, 4, 5, 6)
    ice16_name = (
        F.when(sub == 2, "Local Candidate")
        .when(sub == 3, "Remote Candidate")
        .when(sub == 4, "Selected Candidates")
        .when((sub == 5) & (dtls == "trying"), "DTLS trying")
        .when((sub == 5) & (dtls == "connected"), "DTLS connected")
        .when(sub == 6, "Connection Up"))
    ice1_pt = (t == 16) & (sub == 1) & ice.isin("connecting", "connected",
                                                "ready")
    ice1_name = (F.when(ice == "connecting", "ICE connecting")
                 .when(ice == "connected", "ICE connected")
                 .otherwise("ICE ready"))

    # PERF (r06b): NARROW the frame before the window shuffle — the raw
    # per-type string columns (event_name/jsep_*/ice_state/dtls_state/
    # data_event/emitter) are consumed only by per-row predicates, so they
    # collapse into three tiny pre-shuffle columns: the open-family code
    # `_ofl`, the close-family code `_cfl`, the point-slot selector
    # `_pfam` (fully per-row), plus the precomputed point-span NAME
    # (its only data-dependent strings).  Roughly halves the bytes
    # through the exchange and the window buffer copies; every value is
    # computed from the same expressions, one Project earlier.
    pre = df.select(
        tk.alias("_tk"), F.col(order),
        F.col(ts).cast("long").alias("_ts"),
        F.col(session).cast("string").alias("_session"),
        (F.when(open_att, 0).when(open_sdp, 1).when(open_ice, 2)
         .when(open_sess, 3)).alias("_ofl"),
        (F.when(close_att, 0).when(close_sdp, 1).when(close_ice, 2)
         .when(close_sess, 3)).alias("_cfl"),
        (F.when(close_sess, 0)
         .when(close_att, 1)
         .when(close_sdp, 2)
         .when(ice1_pt, 3)
         .when(ice16 & ice16_name.isNotNull(), 4)
         .when(t == 4, 5)
         .when((t == 64) & data_ev.isin(*_JANUS_USER_EVENTS), 6)
         .when(t == 128, 7)
         .when((t == 256) & (sub == 1), 8)
         .when((t == 256) & (sub == 2), 9))
        .alias("_pfam"),
        (F.when(close_sess, "Session destroyed")
         .when(close_att, "Handle detached")
         .when(close_sdp, "JSEP Event - Answer")
         .when(ice1_pt, ice1_name)
         .when(ice16, ice16_name)
         .when(t == 4, F.lit("External Event"))
         .when((t == 64) & data_ev.isin(*_JANUS_USER_EVENTS),
               F.concat(F.lit("User "), data_ev))
         .when(t == 128, F.lit("Transport connected"))
         .when((t == 256) & (sub == 1), F.lit("Startup"))
         .when((t == 256) & (sub == 2), F.lit("Shutdown")))
        .alias("_pname"))

    # PERF (r06): all seven forward-fills in ONE select — chained
    # withColumn calls leave Project nodes between the Window operators,
    # which defeats CollapseWindow and ran SEVEN sequential Window passes
    # over the exploded stream (one sort, but 7 full running-aggregate
    # iterations).  A single projection puts all last()-over-w expressions
    # into one Window operator; values are unchanged (same spec, same
    # frame, independent expressions).
    base = pre.select(
        "*",
        ffill(3, ts_c).alias("_sess_ts"),
        ffill(0, F.col(order)).alias("_att_ord"),
        ffill(0, ts_c).alias("_att_ts"),
        ffill(1, F.col(order)).alias("_sdp_ord"),
        ffill(1, ts_c).alias("_sdp_ts"),
        ffill(2, F.col(order)).alias("_ice_ord"),
        ffill(2, ts_c).alias("_ice_ts"))

    # PERF (r06): every deterministic id is computed ONCE per row as a
    # named column (the old per-branch span structs re-derived the same
    # md5/concat expressions up to 4x per row and bloated the generated
    # code); the branch chains collapse to ONE family-selector CaseWhen
    # per slot plus small per-field CaseWhens keyed on it.  Values are
    # unchanged: selector order mirrors the old when-chain order exactly,
    # and the unconditional id columns evaluate the identical expressions
    # the old branches evaluated lazily (incl. the concat_ws null-skip for
    # a family that never opened).
    def child_id(family: str, ord_col: Column) -> Column:
        return F.substring(
            F.md5(F.concat_ws(":", F.col("_tk"), F.lit(family),
                              ord_col.cast("string"))), 1, 16)

    # Family SELECTORS are materialized as int columns alongside the ids:
    # Catalyst does not run common-subexpression elimination inside a
    # Generate's generator expression, so anything referenced by several
    # struct fields must be a real column or it re-evaluates per field.
    cfl = F.col("_cfl")
    base = base.select(
        "*",
        (F.when((cfl == 0) & F.col("_att_ord").isNotNull(), 0)
         .when((cfl == 1) & F.col("_sdp_ord").isNotNull(), 1)
         .when((cfl == 2) & F.col("_ice_ord").isNotNull(), 2)
         .when((cfl == 3) & F.col("_sess_ts").isNotNull(), 3))
        .alias("_ofam"))
    # PERF (r06b): every id md5 is GUARDED by the selector that will read
    # it — a non-emitting row (neither slot fires) pays zero hashes and an
    # emitting row hashes only its own families (was 6 unconditional md5
    # per row; the guarded-off ids are null exactly where the pick()
    # selectors never dereference them, so emitted values are unchanged).
    ofam_c, pfam_c = F.col("_ofam"), F.col("_pfam")
    emit_any = ofam_c.isNotNull() | pfam_c.isNotNull()
    base = base.select(
        "*",
        F.when(emit_any, F.md5(F.col("_tk"))).alias("_trace"),
        F.when(emit_any,
               F.substring(F.md5(F.col("_tk")), 1, 16)).alias("_root"),
        F.when((ofam_c == 0) | (pfam_c == 1),
               child_id("att", F.col("_att_ord"))).alias("_attid"),
        F.when((ofam_c == 1) | (pfam_c == 2),
               child_id("sdp", F.col("_sdp_ord"))).alias("_sdpid"),
        F.when((ofam_c == 2) | (pfam_c == 3) | (pfam_c == 4),
               child_id("ice", F.col("_ice_ord"))).alias("_iceid"),
        F.when(pfam_c.isNotNull(),
               child_id("pt", F.col(order))).alias("_ptid"))

    null_parent = F.lit(None).cast("string")
    root_id = F.col("_root")
    att_id, sdp_id, ice_id = F.col("_attid"), F.col("_sdpid"), F.col("_iceid")
    pt_id = F.col("_ptid")

    def pick(sel: Column, vals: "list[Column]") -> Column:
        expr = None
        for i, v in enumerate(vals):
            expr = (F.when(sel == i, v) if expr is None
                    else expr.when(sel == i, v))
        return expr

    # paired OPEN-span emission, at the family's close event
    ofam = F.col("_ofam")
    o_start = pick(ofam, [F.col("_att_ts"), F.col("_sdp_ts"),
                          F.col("_ice_ts"), F.col("_sess_ts")])
    open_emit = F.when(ofam.isNotNull(), F.struct(
        pick(ofam, [F.lit("Handle attached"), F.lit("JSEP Event - Offer"),
                    F.lit("ICE gathering"), F.lit("Session")]).alias("name"),
        pick(ofam, [F.lit("Handle"), F.lit("JSEP"), F.lit("ICE"),
                    F.lit("Session")]).alias("service"),
        pick(ofam, [att_id, sdp_id, ice_id, root_id]).alias("span_id"),
        pick(ofam, [root_id, root_id, root_id,
                    null_parent]).alias("parent_span_id"),
        o_start.cast("long").alias("start_us"),
        ts_c.cast("long").alias("end_us"),
        (ts_c - o_start).cast("long").alias("duration_us")))

    pfam = F.col("_pfam")
    point_emit = F.when(pfam.isNotNull(), F.struct(
        F.col("_pname").alias("name"),
        pick(pfam, [F.lit("Session"), F.lit("Handle"), F.lit("JSEP"),
                    F.lit("ICE"), F.lit("ICE"), F.lit("External"),
                    F.lit("Plugin"), F.lit("Transport Originated"),
                    F.lit("Core"), F.lit("Core")]).alias("service"),
        pt_id.alias("span_id"),
        pick(pfam, [root_id, att_id, sdp_id, ice_id, ice_id, root_id,
                    root_id, root_id, root_id,
                    root_id]).alias("parent_span_id"),
        ts_c.cast("long").alias("start_us"),
        ts_c.cast("long").alias("end_us"),
        (ts_c - ts_c).cast("long").alias("duration_us")))

    # Explode the 2-slot span array FIRST and drop the null slots with a
    # plain post-filter.  An F.filter(...) HOF here would be a
    # CodegenFallback expression, forcing the span-struct CaseWhen trees
    # into interpreted per-row evaluation; explode+IsNotNull keeps them in
    # codegen.  Row set is identical: a null slot exploded then filtered
    # == a slot removed before explode (and rows where both slots are
    # null vanish either way).
    out = (base
           .select(F.col(order), F.col("_session").alias("session_id"),
                   F.col("_trace").alias("trace_id"),
                   F.explode(F.array(open_emit, point_emit)).alias("_sp"))
           .filter(F.col("_sp").isNotNull())
           .select(F.col(order), "session_id", "trace_id",
                   F.col("_sp.span_id").alias("span_id"),
                   F.col("_sp.parent_span_id").alias("parent_span_id"),
                   F.col("_sp.name").alias("name"),
                   F.col("_sp.service").alias("service"),
                   F.col("_sp.start_us").alias("start_us"),
                   F.col("_sp.end_us").alias("end_us"),
                   F.col("_sp.duration_us").alias("duration_us")))
    return out


# --- app_rtpproxy -------------------------------------------------------------

# RTPmap payload-type table (filter_app_rtpproxy.js:10-29 — the public RFC
# 3551 static assignments the reference hardcodes); unknown pt -> 'Dynamic'.
RTP_CODEC_MAP = {0: "PCMU", 3: "GSM", 8: "PCMA", 9: "G722", 18: "G729",
                 34: "H263", 101: "Telephony-Event"}

_RTP_STRUCT = ("c_token string, c_mode string, c_codecs string, "
               "c_corr string, a_port string, a_token string, "
               "d_port string, d_ip string, r_token string, "
               "r_port string, r_ip string, x_p1 string, x_p2 string")


def _rtp_matcher_udf():
    """ONE Arrow pass evaluating every rtpproxy line family's regex and
    returning all groups as a nullable struct (the `_ac_matcher_udf`
    pattern): create command, alias publication, doreply, plain reply,
    cleanup.  Family masks are INDEPENDENT (matching the old per-branch
    contains() filters); only doreply/plain-reply keep the reference's
    if/else precedence.  Patterns are the verbatim branch regexes;
    re.ASCII pins \\s and \\d to Java's ASCII character classes so the
    extracted groups are byte-identical to the former per-group
    regexp_extract calls."""
    cmd = re.compile(r'received command "(.*)\s+(US|U|L)c(.*?)\s(.*?)\s',
                     re.ASCII)
    alias = re.compile(r"new session on IPv4 port\s+(.*) created.*tag\s+(.*)",
                       re.ASCII)
    dore = re.compile(r'rtpc_doreply: sending reply "(.*)\s+([0-9.].*)\\n"',
                      re.ASCII)
    rep = re.compile(r'sending reply "(.*)\s+(.*?)\s(.*?)#012', re.ASCII)
    clean = re.compile(r"session on ports (.*)/(.*?)\sis cleaned up",
                       re.ASCII)
    fams = (("received command ", cmd,
             ("c_token", "c_mode", "c_codecs", "c_corr")),
            ("new session on IPv4 port ", alias, ("a_port", "a_token")),
            (None, dore, ("d_port", "d_ip")),            # doreply (mask below)
            (None, rep, ("r_token", "r_port", "r_ip")),  # plain reply
            ("is cleaned up", clean, ("x_p1", "x_p2")))

    @F.pandas_udf(_RTP_STRUCT)
    def match(s: pd.Series) -> pd.DataFrame:
        s = s.fillna("")
        cols = {name: pd.Series(None, index=s.index, dtype="object")
                for _, _, names in fams for name in names}
        is_do = s.str.contains("rtpc_doreply: sending reply ", regex=False)
        masks = [s.str.contains(fams[0][0], regex=False),
                 s.str.contains(fams[1][0], regex=False),
                 is_do,
                 s.str.contains("sending reply ", regex=False) & ~is_do,
                 s.str.contains(fams[4][0], regex=False)]
        for mask, (_, rx, names) in zip(masks, fams):
            if not mask.any():
                continue
            g = s[mask].str.extract(rx)
            for j, name in enumerate(names):
                cols[name].loc[g.index] = g[j]
        return pd.DataFrame(cols)

    return match


def app_rtpproxy_correlate(df: DataFrame, *, field: str = "message",
                           order: str = "line_no",
                           reuse: bool = True) -> DataFrame:
    """RTPProxy debug-log correlation (plugins/filters/app_rtpproxy/
    filter_app_rtpproxy.js:55-134): the reference keeps a driver-side
    ``ipcache`` keyed by command token (and a port->token alias map) across
    lines; replies complete the cached session and emit a call-correlation
    object.  Relational re-expression — the caches become AS-OF JOINS on
    (token | port) ordered by ``order``:

      * ``received command "<token> [US|U|L]c<codecs> <corr>`` rows CREATE a
        session: first codec -> RTPmap name/rate/pt, direction L->1 else 0
        (:58-74)
      * ``new session on IPv4 port <port> created ... tag <token>`` rows
        publish the port->token alias (:80-84)
      * ``rtpc_doreply: sending reply "<port> <ip>\\n"`` resolves its token
        THROUGH the alias (:86-100); plain ``sending reply "<token> <port>
        <ip>#012`` is keyed directly (:102-115).  Either emits one
        method='create' row with the reply's port/ip joined to the LATEST
        prior create for that token — and consumes it (the reference nulls
        the cache entry), so each create pairs with at most its FIRST
        following reply: groupBy (token, create_order) min(reply_order).
      * ``session on ports <p1>/<p2> is cleaned up`` emits method='delete'
        clones of the session(s) last seen on those ports (:117-133 —
        NOTE: in the reference this branch is dead-by-construction, since
        both reply branches null the cache entry before cleanup can see a
        port; we implement the documented intent).

    Output: one row per emitted correlation object — (method,
    correlation_id, token, codec_name, codec_pt, codec_rate, direction,
    port, ip, `order`).  Everything is equi-joins + windows; the token/port
    keys are high-cardinality, so the shuffles stay balanced at scale.
    """
    # PERF (r06): ONE Arrow pass evaluates every family's line regex
    # (the old branches re-ran 2-4 JVM regexp_extract per matching line —
    # same match, one extract per group — and each of the five branches
    # re-scanned and re-rendered the full input).  The parsed struct is
    # materialized once (dataset._reuse semantics/caveats) and every
    # branch reads its own nullable field set; family masks stay
    # INDEPENDENT exactly like the old per-branch contains() filters
    # (only doreply/plain-reply keep their if/else precedence, as in the
    # reference).  Patterns are verbatim; re.ASCII pins \s/\d to the Java
    # character classes.
    from pastash_spark.operators.dataset import _reuse
    matcher = _rtp_matcher_udf()
    df = _reuse(df.select(F.col(order),
                          matcher(F.col(field).cast("string")).alias("_m")),
                reuse)
    m = F.col("_m")

    def _fam(token_field: str, ord_alias: str,
             *fields: "tuple[str, str]") -> DataFrame:
        tok = m[token_field]
        return (df.filter(tok.isNotNull() & (tok != ""))
                .select(*[m[src].alias(dst) for src, dst in fields],
                        F.col(order).alias(ord_alias)))

    creates = _fam("c_token", "_c_ord",
                   ("c_token", "token"), ("c_mode", "_mode"),
                   ("c_codecs", "_codecs"), ("c_corr", "correlation_id"))
    pt = F.get(F.split(F.col("_codecs"), ","), 0).try_cast("int")
    codec_pairs = []
    for k, v in RTP_CODEC_MAP.items():
        codec_pairs.extend([F.lit(k), F.lit(v)])
    codec_map = F.create_map(*codec_pairs)
    creates = creates.select(
        "token", "correlation_id", "_c_ord",
        F.coalesce(codec_map[pt], F.lit("Dynamic")).alias("codec_name"),
        F.coalesce(pt, F.lit(None)).alias("codec_pt"),
        F.lit(8000).alias("codec_rate"),
        F.when(F.col("_mode") == "L", 1).otherwise(0).alias("direction"))

    aliases = _fam("a_port", "_a_ord",
                   ("a_port", "_a_port"), ("a_token", "_a_token"))

    # reply branch precedence (doreply vs plain) mirrors the reference's
    # if/else chain — encoded in the matcher's masks
    do_replies = _fam("d_port", "_r_ord",
                      ("d_port", "_r_port"), ("d_ip", "ip"))
    # port -> token through the LATEST prior alias publication
    do_replies = (do_replies.join(
        aliases, (F.col("_a_port") == F.col("_r_port"))
        & (F.col("_a_ord") < F.col("_r_ord")), "inner"))
    w_last_alias = Window.partitionBy("_r_ord").orderBy(F.col("_a_ord").desc())
    do_replies = (do_replies
                  .withColumn("_rn", F.row_number().over(w_last_alias))
                  .filter(F.col("_rn") == 1))
    # the reference NULLs ipcache['port_'+port] after emitting (:100) — an
    # alias publication is consumed by its FIRST doreply; later doreplies
    # on the same port need a fresh 'new session on IPv4 port' line
    w_alias_consume = Window.partitionBy("_r_port", "_a_ord") \
        .orderBy(F.col("_r_ord"))
    do_replies = (do_replies
                  .withColumn("_rn2", F.row_number().over(w_alias_consume))
                  .filter(F.col("_rn2") == 1)
                  .select(F.col("_a_token").alias("token"),
                          F.col("_r_port").alias("port"), "ip", "_r_ord"))

    tok_replies = _fam("r_token", "_r_ord",
                       ("r_token", "token"), ("r_port", "port"),
                       ("r_ip", "ip"))
    replies = do_replies.unionByName(tok_replies)

    # PERF (r06b): the as-of pairing is a MERGED per-token stream instead
    # of a reply x create range join + two windows.  The old join emitted
    # every (reply, prior create) combination per token before the as-of
    # window cut it back — quadratic on a hot token — and needed two join
    # exchanges; the merged stream is one hash(token) exchange, a
    # forward-fill window (latest create at/before each reply = the old
    # w_asof winner) and a first-reply-per-create row_number (the old
    # w_first consume rule), which reuses the same partitioning (subset
    # key) so no further shuffle.  A reply whose forward-fill is null has
    # no prior create — exactly the rows the old inner join dropped.
    ns = F.lit(None).cast("string")
    merged_stream = (creates
                     .select("token", F.col("_c_ord").alias("_ord"),
                             F.lit(True).alias("_isc"), "correlation_id",
                             "codec_name", "codec_pt", "codec_rate",
                             "direction", ns.alias("port"), ns.alias("ip"))
                     .unionByName(replies.select(
                         "token", F.col("_r_ord").alias("_ord"),
                         F.lit(False).alias("_isc"),
                         ns.alias("correlation_id"), ns.alias("codec_name"),
                         F.lit(None).cast("int").alias("codec_pt"),
                         F.lit(None).cast("int").alias("codec_rate"),
                         F.lit(None).cast("int").alias("direction"),
                         "port", "ip")))
    # _ord doubles as _c_ord on create rows, so the fill struct needs no
    # extra column and keeps the order column's dtype
    merged_stream = merged_stream.withColumn(
        "_cr", F.when(F.col("_isc"), F.struct(
            "correlation_id", "codec_name", "codec_pt", "codec_rate",
            "direction", F.col("_ord").alias("_c_ord"))))
    # "first reply after the latest create" == "reply whose immediate
    # predecessor in the (token, order) stream is a create": any earlier
    # reply after that create would itself sit between the create and this
    # row.  So the consume rule is a lag() over the SAME window spec as
    # the forward-fill — one sort, one Window pass (a predecessor that is
    # a create also guarantees the fill is non-null).
    w_fill = Window.partitionBy("token").orderBy("_ord")
    paired = (merged_stream
              .withColumn("_f", F.last("_cr", ignorenulls=True).over(w_fill))
              .withColumn("_pc", F.lag("_isc").over(w_fill))
              .filter(~F.col("_isc") & F.col("_pc")))
    created = paired.select(
        F.lit("create").alias("method"),
        F.col("_f.correlation_id").alias("correlation_id"), "token",
        F.col("_f.codec_name").alias("codec_name"),
        F.col("_f.codec_pt").alias("codec_pt"),
        F.col("_f.codec_rate").alias("codec_rate"),
        F.col("_f.direction").alias("direction"), "port", "ip",
        F.col("_ord").alias(order))
    # `created` is both an output branch AND the delete branch's join
    # source.  PERF (r06b): NOT checkpointed anymore — since the merged-
    # stream rewrite both consumers share one exchange subtree that AQE's
    # stage reuse dedups (the old as-of-join shape really did run twice:
    # 15 Window operators from duplicated subtrees), a cleans-empty input
    # prunes the delete branch entirely via empty-relation propagation,
    # and each localCheckpoint cost ~0.5-1.9 s of DRIVER build time per
    # fresh plan (toRdd planning + UDF command broadcast), which the
    # bench's fresh-plan protocol pays every run.

    # cleanup: method='delete' clone of the session last seen on each port
    cleans = (df.filter(m["x_p1"].isNotNull())
              .select(F.explode(F.array(m["x_p1"], m["x_p2"]))
                      .alias("_d_port"),
                      F.col(order).alias("_d_ord"))
              .filter(F.col("_d_port") != ""))
    dels = cleans.join(created.withColumnRenamed(order, "_e_ord"),
                       (F.col("port") == F.col("_d_port"))
                       & (F.col("_e_ord") < F.col("_d_ord")), "inner")
    w_lastsess = Window.partitionBy("_d_ord", "_d_port") \
        .orderBy(F.col("_e_ord").desc())
    dels = (dels.withColumn("_rn", F.row_number().over(w_lastsess))
            .filter(F.col("_rn") == 1)
            .select(F.lit("delete").alias("method"), "correlation_id",
                    "token", "codec_name", "codec_pt", "codec_rate",
                    "direction", "port", "ip",
                    F.col("_d_ord").alias(order)))
    return created.unionByName(dels)


# --- app_audiocodes -----------------------------------------------------------

_AC_STRUCT = ("hit tinyint, remote string, raw_pay string, tail string, "
              "s long, sid string, q array<string>")


def _ac_matcher_udf(in_re: str, out_re: str):
    """ONE Arrow pass evaluating the two heavy audiocodes SIP-message
    regexes per line and returning every needed group at once — hit
    (0 none / 1 incoming / 2 outgoing), remote ip:port (group 2), raw
    payload (group 5) and the trailing group 6 (the reference's ``ip[6]``
    fragment-seek input) — plus (r06) the ``[S=n]`` sequence and
    ``[SID=..]`` session id, which the operator previously re-extracted
    with two more JVM regex passes over every line.  Replaces ~6-8
    per-row JVM regex evaluations (rlike + per-group regexp_extract,
    re-run on lag/lead copies) with a single compiled-regex search per
    line; the patterns are plain ``(.*)``-class expressions, identical
    under Java and Python `re` semantics (both ``search``, both greedy,
    ``.`` excludes newline; sid falls back to "" on no match exactly
    like regexp_extract)."""
    rin, rout = re.compile(in_re), re.compile(out_re)

    @F.pandas_udf(_AC_STRUCT)
    def match(s: pd.Series) -> pd.DataFrame:
        s = s.fillna("")
        hit = pd.Series(0, index=s.index, dtype="int8")
        remote = pd.Series(None, index=s.index, dtype="object")
        raw = pd.Series(None, index=s.index, dtype="object")
        tail = pd.Series(None, index=s.index, dtype="object")
        is_in = s.str.contains("Incoming SIP Message", regex=False)
        # reference branch order: Incoming checked first (elif Outgoing)
        is_out = ~is_in & s.str.contains("Outgoing SIP Message", regex=False)
        for mask, rx, code in ((is_in, rin, 1), (is_out, rout, 2)):
            if not mask.any():
                continue
            g = s[mask].str.extract(rx)  # one regex eval per line
            ok = g[0].notna()
            idx = g.index[ok]
            hit.loc[idx] = code
            remote.loc[idx] = g.loc[idx, 1]
            raw.loc[idx] = g.loc[idx, 4]
            tail.loc[idx] = g.loc[idx, 5]
        seq = pd.array(
            pd.to_numeric(s.str.extract(r"\[S=([0-9]+)\]", expand=False),
                          errors="coerce"), dtype="Int64")
        sid = s.str.extract(r"\[SID=(.*?):(.*?):(.*?)\]")[2].fillna("")
        # PERF (r06b): the MEDIA_END tokenizer rides the same pass — the
        # old JVM filter(transform(split)) HOF chain is CodegenFallback
        # and its guarded column cost ~0.8 s/1M rows interpreted even
        # with ZERO matching lines.  Same tokens: re.ASCII \s+\| split
        # (= Java \s), trim = strip(' ') (= F.trim, spaces only),
        # keep len > 1, then the 25-field drop of idx 15/5 exactly like
        # the old slice-concat fixup.
        # [None]*n, not scalar None — pandas coerces a scalar fill to NaN
        # even at dtype=object, and Arrow can't serialize NaN as a null
        # list value
        q = pd.Series([None] * len(s), index=s.index, dtype="object")
        med = s.str.contains("MEDIA_END ", regex=False)
        if med.any():
            for i in s.index[med]:
                toks = [t for t in
                        (t0.strip(" ") for t0 in _AC_SPLIT.split(s[i]))
                        if len(t) > 1]
                if len(toks) == 25:
                    toks = toks[0:5] + toks[6:15] + toks[16:25]
                q[i] = toks
        return pd.DataFrame(
            {"hit": hit, "remote": remote, "raw_pay": raw, "tail": tail,
             "s": seq, "sid": sid, "q": q})

    return match


_AC_SPLIT = re.compile(r"\s+\|", re.ASCII)

def _ac_native_reparse(mm: Column, in_re: str, out_re: str) -> Column:
    """Native (JVM, guarded) twin of `_ac_matcher_udf` for the re-parse of
    reassembled lines: same branch order (Incoming contains-check first),
    same search semantics, returns the same struct shape with s/sid null
    (no consumer reads them on the merge path)."""
    # (?d) = Java UNIX_LINES: `.` excludes only \n, matching Python re's
    # dot exactly (Java's default dot also excludes \r/ /...)
    jin, jout = "(?d)" + in_re, "(?d)" + out_re
    is_in = mm.contains("Incoming SIP Message")
    is_out = ~is_in & mm.contains("Outgoing SIP Message")
    in_ok = is_in & mm.rlike(jin)
    out_ok = is_out & mm.rlike(jout)

    def grp(i: int) -> Column:
        return (F.when(in_ok, F.regexp_extract(mm, jin, i))
                .when(out_ok, F.regexp_extract(mm, jout, i)))

    hit = (F.when(in_ok, F.lit(1)).when(out_ok, F.lit(2))
           .otherwise(F.lit(0)).cast("tinyint"))
    return F.struct(hit.alias("hit"), grp(2).alias("remote"),
                    grp(5).alias("raw_pay"), grp(6).alias("tail"),
                    F.lit(None).cast("long").alias("s"),
                    F.lit(None).cast("string").alias("sid"),
                    F.lit(None).cast("array<string>").alias("q"))


def app_audiocodes_correlate(df: DataFrame, *, field: str = "message",
                             order: str = "line_no",
                             key: "Sequence[str] | None" = None,
                             localip: str = "127.0.0.1",
                             localport: int = 5060,
                             correlation_hdr: str | None = None,
                             logs: bool = False, qos: bool = True,
                             partition_by_sid: bool = True,
                             version: str = "7.20A.260.012",
                             debug: bool = False, file_debug: bool = False,
                             bypass: bool = False, autolocal: bool = False,
                             ini=False, iniwatch: bool = False,
                             correlation_contact: bool = False) -> DataFrame:
    """AudioCodes SBC syslog -> SIP/HEP correlation (plugins/filters/
    app_audiocodes/filter_app_audiocodes.js, default version
    7.20A.260.012).  The reference keeps driver-side state across lines —
    a one-packet reassembly hold (``hold``/``cache``/``seq``, :135-145),
    and an SID -> Call-ID LRU (``sidcache``, :271-273 set, :348 get).
    Batch re-expression, one output row per emitted HEP-able object:

      * ``Incoming/Outgoing SIP Message`` lines (:150-279) parse remote
        ``ip:port`` + the ``#012``-separated SIP payload; direction decides
        src/dst vs the local interface; Call-ID comes from the payload
        (``call-id:`` match, compact or full) falling back to the line's
        ``[SID=mac:seq:sid]`` sid; ``2.0/TCP``/``2.0/TLS`` in the payload
        flips protocol 17 -> 6 (:96-99).  proto_type=1 (SIP).
      * Fragmented messages — the SIP-message regex fails on the line —
        merge with the NEXT line when its ``[S=n]`` sequence is exactly
        one higher (:135-145): a lead() window over ``order``, one
        continuation packet like the reference's single ``cache`` slot.
        The 'Seek final fragment' re-hold (:209/:276) is implemented one
        level deep: a MATCHED line whose trailing group contains another
        ``' SIP Message '`` also merges with the next [S=n+1] line and
        emits that SECOND message (chained re-holds — a third message in
        the same line — are not re-held, matching the single-slot model).
        Both heavy version regexes run ONCE per line inside a single
        Arrow pass (`_ac_matcher_udf`); lead/lag ride precomputed
        struct/ tail columns, never regex re-evaluation.
      * ``MEDIA_END`` lines (:294-341, qos=True) split on ``|`` into the
        QoS vector and emit TWO proto_type=35 rows (A-leg / B-leg) whose
        payload is the reference's JSON report — MOS = 4.5*int(q)/127,
        REPORT_NAME, reversed ip:port pairs for the B-leg.
      * ``CALL_END`` lines (:287-292, logs=True) emit one proto_type=100
        row with the JSON field vector; other SID-carrying lines
        (logs=True, :342-351) emit proto_type=100 raw-line rows whose
        correlation id resolves through the SID->Call-ID as-of fill
        (the sidcache twin) with src/dst local:514.

    INI interface resolution (:44-55) is config-file plumbing, not data
    flow — out of scope (``localip``/``localport`` cover the resolved
    values).  Output: (`order`, sid, proto_type, payload, correlation_id,
    src_ip, src_port, dst_ip, dst_port, protocol).
    """
    # literal CRLF substitution — F.replace does a plain substring scan
    # (identical result to the old regexp_replace of the literal pattern,
    # without regex-engine cost per line)
    line0 = F.replace(F.col(field), F.lit("\r\n"), F.lit("#012"))
    # per-version regex pairs, verbatim from filter_app_audiocodes.js
    # :151-162/:222-230; any other version string falls back to the
    # 7.20A.260.012 defaults exactly like the reference's else branch.
    # debug/file_debug/bypass/iniwatch are accepted for recipe
    # compatibility but inert (logging / raw-passthrough knobs);
    # ini/autolocal interface-alias resolution is config-file plumbing —
    # out of scope, pass the resolved values via localip/localport.
    if version == "7.40A.500":
        in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
                 r"#[0-9] \((.*)\) (.*) TO\(#[0-9]\) ----  (.*)()")
        out_re = (r"(.*) ---- Outgoing SIP Message to (.*) from SIPInterface "
                  r"#[0-9] \((.*)\) (.*) TO\(#.*\) ----  (.*)()")
    elif version == "7.20A.256.511":
        in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
                 r"#[0-9] \((.*)\) (.*) TO.*---  (.*)()")
        out_re = (r"(.*)---- Outgoing SIP Message to (.*) from SIPInterface "
                  r"#[0-9] \((.*)\) (.*) TO.*---  (.*)()")
    else:
        in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
                 r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012(.*)")
        out_re = (r"(.*)---- Outgoing SIP Message to (.*) from SIPInterface "
                  r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012 (.*)")
    matcher = _ac_matcher_udf(in_re, out_re)

    # ``key`` partitions the reassembly stream (one device/file per
    # partition — pass e.g. ["path"]); ``partition_by_sid`` (the DEFAULT)
    # keys the stream on the extracted [SID=..] session instead — a
    # documented, scale-correct divergence: a fragmented message's
    # continuation packet carries the SAME SID, so per-SID ordering
    # preserves the seq+1 reassembly while the shuffle key becomes
    # high-cardinality.  Passing key=None AND partition_by_sid=False
    # reproduces the reference's one-agent global stream exactly but is a
    # single-partition global sort — the scale-killer BENCH.md documents —
    # so it must be an explicit opt-in.
    seq_keys = list(key or ())
    if partition_by_sid:
        seq_keys.append("sid")
    w_seq = (Window.partitionBy(*seq_keys) if seq_keys
             else Window.partitionBy()).orderBy(F.col(order))
    tail_re = r".*\[S=[0-9]+\].*?\[SID=.*?\]\s?(.*)\[Time:.*\]"
    base = (df.select(*(key or ()), F.col(order), line0.alias("_l"))
            .withColumn("_p", matcher(F.col("_l")))
            # seq + sid come out of the same Arrow pass (was two more
            # JVM regex evaluations per line)
            .withColumn("_s", F.col("_p.s"))
            .withColumn("sid", F.col("_p.sid")))
    is_sipline = (F.col("_l").contains("Incoming SIP Message")
                  | F.col("_l").contains("Outgoing SIP Message"))
    incomplete = is_sipline & (F.col("_p.hit") == 0)
    # 'Seek final fragment' re-hold (:209/:276): a MATCHED line whose
    # trailing group carries another ' SIP Message ' holds itself too —
    # the next [S=n+1] line completes a SECOND message (the reference's
    # greedy group-1 re-parse of cache+tail).  One reassembly level, like
    # the reference's single cache slot; gated off for 7.40A.500 exactly
    # as upstream.
    if version == "7.40A.500":
        refrag = F.lit(False)
    else:
        refrag = ((F.col("_p.hit") != 0)
                  & F.coalesce(F.col("_p.tail").contains(" SIP Message "),
                               F.lit(False)))
    base = base.withColumn("_hold", incomplete | refrag)
    # one-slot reassembly: a held line + the next [S=n+1] line.
    # PERF (r06): the continuation tail (reassembly `message` regex group 2,
    # reference :130-133 test[2]) is extracted LAZILY from the lead() copy
    # of the raw line — only rows that actually merge (held line with a
    # seq+1 successor, a rare event) pay the backtracking tail regex,
    # instead of every input row pre-computing `_mtail`.  The extracted
    # value is identical: same regex, same (next) line.
    # PERF (r06b): ALL four window expressions (the reassembly leads AND
    # the _consumed lags) ride ONE select — their inputs (_s, _l, _hold)
    # all exist pre-window, and the intervening merge/reparse Projects had
    # kept CollapseWindow from fusing the two same-spec Window operators.
    base = base.select(
        "*",
        F.lead("_s", 1).over(w_seq).alias("_ns"),
        F.lead("_l", 1).over(w_seq).alias("_nl"),
        F.lag("_hold", 1).over(w_seq).alias("_ph"),
        F.lag("_s", 1).over(w_seq).alias("_ps"))
    nxt_mtail = F.regexp_extract(F.col("_nl"), tail_re, 1)
    can_merge = F.col("_ns") == F.col("_s") + 1
    merged = F.concat(F.regexp_replace(F.col("_l"), r"\[Time.*\]$", ""),
                      F.when(F.col("_nl").isNotNull(), nxt_mtail)
                      .otherwise(F.lit("")))
    merge_cond = incomplete & can_merge
    refrag_cond = refrag & can_merge
    base = (base
            .withColumn("_line", F.when(merge_cond, merged)
                        .otherwise(F.col("_l")))
            # window-expression conditions must be materialized before any
            # .filter can reference them (no window funcs in WHERE)
            .withColumn("_refrag_ok", refrag_cond)
            # PERF (r06b): the reassembled-string re-parse is NATIVE
            # guarded regex now, not a second Arrow pass — the old matcher
            # call round-tripped every row through Python (1M-row Arrow
            # serialization) to parse only the rare merged lines.  The when()
            # guards make each rlike/regexp_extract evaluate ONLY on rows
            # where merge_cond|refrag_cond holds (codegen branches are
            # lazy); the operator already relies on these patterns being
            # semantically identical under Java and Python `re` (both
            # search, both greedy, `.` excludes newline), and the `(.*)`
            # groups always participate so regexp_extract's ""-on-miss
            # never diverges from the UDF's null (guarded by the rlike
            # hit test exactly like the UDF's notna() gate).  Fields
            # s/sid are null — no _pf consumer reads them (non-merge rows
            # take _p's real values through the otherwise branch).
            .withColumn("_pm", _ac_native_reparse(
                F.when(merge_cond | refrag_cond, merged), in_re, out_re)))
    base = base.withColumn(
        "_pf", F.when(merge_cond, F.col("_pm")).otherwise(F.col("_p")))
    # PERF (r06b): NARROW the frame to scalar fields before the second
    # window pass — carrying the whole _p/_pm/_pf structs (raw line
    # duplicates, tails, token arrays) through the window buffer cost
    # ~1 s/1M rows in row-copy overhead; only hit/remote/raw_pay are ever
    # read downstream (plus q for qos, the raw/merged lines for logs).
    narrow = [*(key or ()), F.col(order), "sid", "_s", "_ph", "_ps",
              "_refrag_ok",
              F.col("_pf.hit").alias("_f_hit"),
              F.col("_pf.remote").alias("_f_remote"),
              F.col("_pf.raw_pay").alias("_f_raw"),
              F.col("_pm.hit").alias("_m_hit"),
              F.col("_pm.remote").alias("_m_remote"),
              F.col("_pm.raw_pay").alias("_m_raw")]
    if qos:
        narrow.append(F.col("_p.q").alias("_qraw"))
    if logs:
        narrow.extend(["_l", "_line"])
    base = base.select(*narrow)
    # a line consumed as a continuation must not emit again (the lags
    # were computed in the fused window select above)
    base = base.withColumn(
        "_consumed",
        F.coalesce(F.col("_ph") & (F.col("_ps") == F.col("_s") - 1),
                   F.lit(False)))

    # PERF (r06): ONE pass over `base` instead of three — the primary SIP
    # emission, the re-hold second message and (qos) both MEDIA_END legs
    # become four nullable struct SLOTS exploded from a single array; the
    # previous unionByName branches each re-ran the whole scan + Arrow
    # matcher + lead/lag window subtree (plan showed it triplicated).
    # Slot values/conditions are byte-identical to the old branch
    # filters/selects; a null slot (condition false/null) is dropped after
    # the explode exactly as the old .filter dropped its row.
    def _sip_struct(hit: Column, remote: Column, raw_pay: Column,
                    extra_filter: Column) -> Column:
        """proto_type=1 SIP slot from one parsed (hit, remote, raw_pay)
        field trio — the primary parse and the re-hold second message
        share this."""
        if version in ("7.40A.500", "7.20A.256.511"):
            # these versions' payload group runs to end-of-line — shed the
            # [Time:...] trailer the 7.20A.260 pattern excludes structurally
            raw_pay = F.regexp_replace(raw_pay, r"\s*\[Time:.*\]$", "")
        # postProcess (:57-60): #012 -> CRLF, trim, terminal CRLFCRLF
        # JS String.trim strips ALL whitespace incl. CRLF; Spark's trim
        # only strips spaces.  PERF (r06b): literal F.replace for the
        # #012 substitution (plain substring scan) and btrim over the
        # exact Java-regex-\s charset [ \t\n\x0B\f\r] — identical output
        # to the old regexp_replace('#012') + regexp_replace(^\s+|\s+$)
        # pair, no regex engine per row
        payload = F.concat(
            F.btrim(
                F.replace(F.concat(raw_pay, F.lit("#012 #012")),
                          F.lit("#012"), F.lit("\r\n")),
                F.lit(" \t\n\x0b\f\r")),
            F.lit("\r\n\r\n"))
        callid = F.regexp_extract(payload,
                                  r"(?i)call-id:\s?(.*?)\s?\r\n", 1)
        corr = F.when(callid != "", callid).otherwise(F.col("sid"))
        if correlation_hdr:
            xcid = F.regexp_extract(
                payload, correlation_hdr + r":\s?(.*)\r\n\r\n", 1)
            corr = (F.when(payload.startswith("INVITE") & (xcid != ""),
                           xcid).otherwise(corr))
        proto = F.when(payload.contains("2.0/TCP")
                       | payload.contains("2.0/TLS"), 6).otherwise(17)
        incoming = hit == 1
        r_ip = F.get(F.split(remote, ":"), 0)
        r_port = F.get(F.split(remote, ":"), 1).try_cast("int")
        return F.when(
            (hit != 0) & ~F.col("_consumed") & extra_filter,
            F.struct(
                F.lit(1).alias("proto_type"),
                payload.alias("payload"), corr.alias("correlation_id"),
                F.when(incoming, r_ip).otherwise(F.lit(localip))
                 .alias("src_ip"),
                F.when(incoming, r_port).otherwise(F.lit(localport))
                 .cast("int").alias("src_port"),
                F.when(incoming, F.lit(localip)).otherwise(r_ip)
                 .alias("dst_ip"),
                F.when(incoming, F.lit(localport)).otherwise(r_port)
                 .cast("int").alias("dst_port"),
                proto.alias("protocol")))

    # the re-hold's second message rides the SAME order value, directly
    # after its primary row
    slots = [_sip_struct(F.col("_f_hit"), F.col("_f_remote"),
                         F.col("_f_raw"), F.lit(True)),
             _sip_struct(F.col("_m_hit"), F.col("_m_remote"),
                         F.col("_m_raw"), F.col("_refrag_ok"))]
    l = F.col("_line")
    schema_cols = ["proto_type", "payload", "correlation_id", "src_ip",
                   "src_port", "dst_ip", "dst_port", "protocol"]

    if qos:
        # MEDIA_END: split on whitespace+pipe like the reference's
        # /(\s+\|)/ tokenizer (:297) — a '|' NOT preceded by whitespace
        # stays inside its field; 25-field variants drop idx 15 then idx 5
        # (:299-302) so both shapes index identically.  Divergence (doc'd):
        # we trim each token, the reference keeps a leading space when the
        # separator has trailing whitespace (' | b' -> ' b') — real
        # MEDIA_END vectors use 'field |field' so the planes agree.
        # PERF (r06b): the tokens come pre-split from the Arrow matcher
        # pass (`_p.q`, MEDIA_END lines only) — the old JVM
        # filter(transform(split)) HOF chain was CodegenFallback and its
        # guarded column cost ~0.8 s per 1M rows interpreted even with
        # zero MEDIA_END lines.  The matcher tokenizes the RAW line;
        # `_line` differs only for reassembled SIP fragments, which are
        # never MEDIA_END records (doc'd divergence class as above).
        base = base.withColumn(
            "_q", F.when(~F.col("_consumed"), F.col("_qraw")))
        q = F.col("_q")
        media_ok = ((F.size(q) > 21)
                    & (F.get(q, 2) != "")
                    & (F.get(q, 21).isNotNull()))

        def g(i):
            return F.get(q, i)

        def report(dir_, src, sport, dst, dport, mos_i, pk_i):
            # deliberate divergence: the reference serializes the full JS
            # double (4.5*q/127); we round to 6 dp so the JSON payload is
            # byte-stable across engines for the analytic oracle
            mos = F.round(F.lit(4.5) * g(mos_i).try_cast("int") / 127, 6)
            pay = F.to_json(F.struct(
                g(2).alias("CORRELATION_ID"),
                g(2).alias("RTP_SIP_CALL_ID"),
                mos.alias("MOS"),
                g(pk_i).try_cast("int").alias("TOTAL_PK"),
                g(5).alias("CODEC_NAME"),
                F.lit(dir_).alias("DIR"),
                F.concat(g(4), F.lit("_"), src, F.lit(":"), sport)
                 .alias("REPORT_NAME"),
                F.lit(dir_).alias("PARTY"),
                F.lit("HANGUP").alias("TYPE")))
            return F.struct(
                F.lit(35).alias("proto_type"), pay.alias("payload"),
                g(2).alias("correlation_id"), src.alias("src_ip"),
                sport.try_cast("int").alias("src_port"),
                dst.alias("dst_ip"),
                dport.try_cast("int").alias("dst_port"),
                F.lit(17).alias("protocol"))

        slots.append(F.when(media_ok,
                            report(0, g(7), g(8), g(9), g(10), 17, 11)))
        slots.append(F.when(media_ok,
                            report(1, g(9), g(10), g(7), g(8), 18, 12)))

    # Materialize every slot as a COLUMN before the explode: Catalyst does
    # no common-subexpression elimination inside a Generate's generator
    # expression, so an inline slot would re-run its payload regex chain
    # once per field reference; as Project columns they evaluate once per
    # row with codegen CSE.
    slot_names = [f"_slot{i}" for i in range(len(slots))]
    for nm, s in zip(slot_names, slots):
        base = base.withColumn(nm, s)
    core = (base.select(F.col(order), "sid",
                        F.explode(F.array(*[F.col(n) for n in slot_names]))
                        .alias("_r"))
            .filter(F.col("_r").isNotNull())
            .select(F.col(order), "sid",
                    *[F.col(f"_r.{c}") for c in schema_cols]))
    outs = [core]

    if logs:
        cdr_toks = F.filter(
            F.transform(F.split(l, r"\s+\|"), lambda x: F.trim(x)),
            lambda x: F.length(x) > 1)
        call_end = (base.filter(l.contains("CALL_END ")
                                & ~F.col("_consumed"))
                    .withColumn("_cdr", cdr_toks)
                    .select(
            F.col(order), "sid", F.lit(100).alias("proto_type"),
            F.to_json(F.col("_cdr")).alias("payload"),
            F.coalesce(F.get(F.col("_cdr"), 3), F.lit(""))
             .alias("correlation_id"),
            F.lit(localip).alias("src_ip"),
            F.lit(0).cast("int").alias("src_port"),
            F.lit(localip).alias("dst_ip"),
            F.lit(0).cast("int").alias("dst_port"),
            F.lit(17).alias("protocol")))
        outs.append(call_end)
        # other SID-carrying lines: correlation through the sidcache twin —
        # as-of last SIP Call-ID published for that sid
        others = base.filter(
            (F.col("sid") != "") & ~is_sipline & ~F.col("_consumed")
            & ~l.contains("CALL_END ") & ~l.contains("MEDIA_END "))
        sip_cids = core.filter(F.col("proto_type") == 1).select(
            "sid", F.col(order).alias("_o"),
            F.col("correlation_id").alias("_cid"))
        # as-of join sip_cids to each log line (latest _o < order)
        logline = others.select(F.col(order), "sid", "_line")
        j = logline.join(sip_cids, "sid", "left") \
            .filter(F.col("_o").isNull() | (F.col("_o") < F.col(order)))
        w_last = Window.partitionBy("sid", order).orderBy(F.col("_o").desc())
        j = (j.withColumn("_rn", F.row_number().over(w_last))
             .filter(F.col("_rn") == 1))
        outs.append(j.select(
            F.col(order), "sid", F.lit(100).alias("proto_type"),
            F.col("_line").alias("payload"),
            F.coalesce(F.col("_cid"), F.col("sid"))
             .alias("correlation_id"),
            F.lit(localip).alias("src_ip"),
            F.lit(514).cast("int").alias("src_port"),
            F.lit(localip).alias("dst_ip"),
            F.lit(514).cast("int").alias("dst_port"),
            F.lit(17).alias("protocol")))

    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
