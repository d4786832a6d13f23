"""Correlation / sessionization / aggregation operators (SURVEY.md §2.3).

The reference keeps per-key mutable state in LRU / dirty-db stores and flushes
on timers (filter_esl.js:137-251, base_filter_buffer.js:11-57,
plugins/filters/cacheloop/filter_cacheloop.js:42-114).  Batch-Spark re-derives
the same outputs from ordered windows and groupBys — one shuffle on the
correlation key, partial aggregation map-side, no driver state.  Streaming
variants live in streaming/.
"""

from __future__ import annotations

from typing import Sequence

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
    """
    w = (Window.partitionBy(key).orderBy(F.col(ts))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    enriched = (df
                .withColumn("_created",
                            F.last(F.when(F.col(event) == "CHANNEL_CREATE",
                                          F.col(ts)), ignorenulls=True).over(w))
                .withColumn("_answered",
                            F.last(F.when(F.col(event) == "CHANNEL_ANSWER",
                                          F.col(ts)), ignorenulls=True).over(w)))
    return (enriched.groupBy(key)
            .agg(F.min(ts).alias("created_at"),
                 F.max("_answered").alias("answered_at"),
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
    def latest(src: DataFrame, key: str, *vals: str) -> DataFrame:
        w = (Window.partitionBy(key)
             .orderBy(F.col(ts).desc(), F.col(order).desc()))
        return (src.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(key, *vals))

    live = df.filter(F.col("type") != 64)
    t1 = live.filter((F.col("type") == 1) & F.col("session_id").isNotNull()
                     & F.col("transport_id").isNotNull())
    sess2tr = latest(t1, "session_id", "transport_id").select(
        F.col("session_id").alias("_m_sess"),
        F.col("transport_id").alias("_mtr"))
    tr2sess = latest(t1, "transport_id", "session_id").select(
        F.col("transport_id").alias("_bf_tr"),
        F.col("session_id").alias("_bf_session"))
    sess2op = latest(
        live.filter((F.col("type") == 2) & F.col("session_id").isNotNull()
                    & F.col("opaque_id").isNotNull()),
        "session_id", "opaque_id").select(
        F.col("session_id").alias("_op_sess"),
        F.col("opaque_id").alias("_op"))
    tr2ip = latest(
        live.filter((F.col("type") == 128) & F.col("transport_id").isNotNull()
                    & F.col("ip").isNotNull()),
        "transport_id", "ip", "port").select(
        F.col("transport_id").alias("_ip_tr"),
        F.col("ip").alias("_tip"), F.col("port").alias("_tport"))

    out = (live
           # type-128 session backfill through the transport pairing
           .join(tr2sess,
                 (F.col("type") == 128) &
                 (F.col("transport_id") == F.col("_bf_tr")), "left")
           .withColumn("session_id", F.coalesce("session_id", "_bf_session"))
           .drop("_bf_tr", "_bf_session")
           # opaque propagation per (possibly backfilled) session
           .join(sess2op,
                 F.col("session_id") == F.col("_op_sess"), "left")
           .withColumn("opaque_id", F.coalesce("opaque_id", "_op"))
           .drop("_op_sess", "_op")
           # media enrichment: session -> transport -> ip/port
           .join(sess2tr,
                 (F.col("type") == 32) &
                 (F.col("session_id") == F.col("_m_sess")), "left")
           .join(tr2ip,
                 F.col("_mtr") == F.col("_ip_tr"), "left")
           .withColumn("media_ip",
                       F.when(F.col("type") == 32,
                              F.coalesce("_tip", F.lit("0.0.0.0"))))
           .withColumn("media_port",
                       F.when(F.col("type") == 32,
                              F.coalesce(F.col("_tport").cast("int"),
                                         F.lit(0))))
           .drop("_m_sess", "_mtr", "_ip_tr", "_tip", "_tport"))
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
