"""Query registry: one entry per implemented operator (SURVEY.md §2) plus the
training-data ops, each paired with an ANSI-SQL oracle DuckDB can run on the
same parquet tables — the driver's correctness gate.

Every Spark query and its oracle alias computed columns to IDENTICAL names
(the driver sorts columns by name before value-hashing).  Queries avoid
nondeterminism: explicit ORDER-insensitive outputs, integer/string results
where float tie-breaks could differ, and deterministic derivations of any
synthetic inputs (both engines derive them with the same arithmetic).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pastash_spark.operators import correlate as C
from pastash_spark.operators import mutate as M
from pastash_spark.operators import parse as P
from pastash_spark.operators import route as R
from pastash_spark.operators.enrich import asof_lookup, broadcast_lookup

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# =========================================================================
# §2.1 parse / predicate operators, exercised on the `events`/`documents`
# tables (events.props is a JSON string ~ the reference's `message`).
# =========================================================================

@_q("grep", """
SELECT event_id, event_type FROM events
WHERE regexp_matches(props, '"k": 1[0-9]\\}')
""")
def q_grep(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return P.grep(ev, '"k": 1[0-9]\\}', field="props").select("event_id", "event_type")


@_q("regex_extract", """
SELECT event_id,
       CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val
FROM events
""")
def q_regex_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = P.regex_extract(ev, r'"k": ([0-9]+)', field="props", fields=["k_val"])
    return out.select("event_id", F.col("k_val").cast("long").alias("k_val"))


@_q("json_fields", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
""")
def q_json_fields(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id",
                     F.get_json_object("props", "$.k").cast("long").alias("k_val"))


@_q("split_explode", """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""")
def q_split_explode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").withColumnRenamed("text", "message")
    return (P.split(docs, delimiter=" ")
            .groupBy(F.col("message").alias("word"))
            .agg(F.count("*").alias("cnt")))


@_q("mutate_gsub", """
SELECT doc_id, length(regexp_replace(text, 'a', 'X', 'g')) AS n
FROM documents
""")
def q_mutate_gsub(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (M.gsub(docs, "text", "a", "X")
            .select("doc_id", F.length("text").alias("n")))


@_q("truncate", """
SELECT doc_id, substring(text, 1, 20) AS message FROM documents
""")
def q_truncate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").withColumnRenamed("text", "message")
    return P.truncate(docs, max_size=20).select("doc_id", "message")


@_q("mutate_hash", """
SELECT doc_id, md5(text) AS text_hash FROM documents
""")
def q_mutate_hash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents") \
        .withColumn("text_hash", F.col("text"))
    return M.mutate_hash(docs, "text_hash", algo="md5").select("doc_id", "text_hash")


@_q("syslog_pri", """
SELECT event_id, sev, fac,
       (['emergency','alert','critical','error','warning','notice',
         'informational','debug'])[sev + 1] AS sev_name
FROM (SELECT event_id,
             CAST(event_id % 192 AS INT) % 8  AS sev,
             CAST(event_id % 192 AS INT) // 8 AS fac
      FROM events)
""")
def q_syslog_pri(spark, sf_dir):
    ev = _t(spark, sf_dir, "events") \
        .withColumn("syslog_pri", (F.col("event_id") % 192).cast("int"))
    out = P.syslog_pri(ev)
    return out.select("event_id",
                      F.col("syslog_severity").alias("sev"),
                      F.col("syslog_facility").alias("fac"),
                      F.col("syslog_severity_name").alias("sev_name"))


@_q("http_status_classifier", """
SELECT event_id, status,
       CASE WHEN status = 418 THEN '418'
            ELSE CAST(status // 100 AS VARCHAR) || 'xx' END AS status_class
FROM (SELECT event_id,
             CAST(100 + (event_id % 5) * 100 + (event_id % 40) AS INT) AS status
      FROM events)
""")
def q_http_status(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "status", (100 + (F.col("event_id") % 5) * 100 + F.col("event_id") % 40).cast("int"))
    return (P.http_status_classifier(ev, special_codes=[418])
            .select("event_id", "status", "status_class"))


@_q("ipproto", """
SELECT event_id, proto,
       CASE proto WHEN 1 THEN 'icmp' WHEN 2 THEN 'igmp' WHEN 6 THEN 'tcp'
                  WHEN 17 THEN 'udp' WHEN 41 THEN 'ipv6' WHEN 47 THEN 'gre'
                  WHEN 50 THEN 'esp' WHEN 51 THEN 'ah' WHEN 58 THEN 'ipv6-icmp'
                  WHEN 89 THEN 'ospf' WHEN 94 THEN 'ipip' WHEN 103 THEN 'pim'
                  WHEN 132 THEN 'sctp' END AS proto_name
FROM (SELECT event_id, CAST(event_id % 140 AS INT) AS proto FROM events)
""")
def q_ipproto(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "proto", (F.col("event_id") % 140).cast("int"))
    return P.ipproto(ev).select("event_id", "proto", "proto_name")


# =========================================================================
# §2.0/§2.2 compute / interpolation / enrichment
# =========================================================================

@_q("compute_field", """
SELECT event_id, event_type || '/' || CAST(user_id AS VARCHAR) AS derived
FROM events
""")
def q_compute_field(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return M.compute_field(ev, "derived", "#{event_type}/#{user_id}") \
        .select("event_id", "derived")


@_q("compute_date_field", """
SELECT event_id, strftime(ts, '%Y-%m-%d %H') AS day_hour FROM events
""")
def q_compute_date(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumnRenamed("ts", "@timestamp")
    return (M.compute_date_field(ev, "day_hour", "YYYY-MM-DD HH")
            .select("event_id", "day_hour"))


@_q("eval_expr", """
SELECT event_id, value * 2 + 1 AS y FROM events
""")
def q_eval(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return M.eval_expr(ev, "y", "value * 2 + 1").select("event_id", "y")


@_q("broadcast_enrich", """
WITH lk(event_type, weight) AS (VALUES ('click', 1.0), ('view', 0.5),
       ('purchase', 5.0), ('signup', 3.0), ('error', 0.0))
SELECT e.event_id, lk.weight
FROM events e LEFT JOIN lk ON e.event_type = lk.event_type
""")
def q_broadcast_enrich(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    lk = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0),
         ("signup", 3.0), ("error", 0.0)], "event_type string, weight double")
    return broadcast_lookup(ev, lk, "event_type").select("event_id", "weight")


@_q("asof_lru_lookup", """
SELECT event_id,
       last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_signup_value
FROM events
""")
def q_asof_lru(spark, sf_dir):
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    published = F.when(F.col("event_type") == "signup", F.col("value"))
    return ev.withColumn("last_signup_value",
                         F.last(published, ignorenulls=True).over(w)) \
        .select("event_id", "last_signup_value")


# =========================================================================
# §2.3 correlation / sessionization / aggregation
# =========================================================================

@_q("cacheloop_agg", """
SELECT user_id AS extract, COUNT(*) AS count, AVG(value) AS avg_value
FROM events GROUP BY user_id
""")
def q_cacheloop(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return C.cacheloop_aggregate(ev, extract="user_id",
                                 avg_fields=["value"], collect=False) \
        .withColumnRenamed("avg_value", "avg_value")


@_q("sessionize", """
SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         SUM(CASE WHEN prev_ts IS NULL
                  OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events))
GROUP BY user_id
""")
def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    # deterministic tiebreak on event_id to match the oracle exactly
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = (prev.isNull() | (F.col("ts").cast("double") - prev.cast("double") > 1800)).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(run))
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"))


@_q("multiline", """
SELECT user_id, grp,
       string_agg(event_type, '|' ORDER BY ts, event_id) AS message,
       COUNT(*) AS n_lines
FROM (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM events)
GROUP BY user_id, grp
""")
def q_multiline(spark, sf_dir):
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.col("event_type") == "signup").cast("int")
    grouped = ev.withColumn("grp", F.sum(start).over(w))
    return (grouped.groupBy("user_id", "grp")
            .agg(F.concat_ws("|", F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("ts").alias("o1"), F.col("event_id").alias("o2"),
                        F.col("event_type").alias("m")))),
                    lambda s: s["m"])).alias("message"),
                 F.count("*").alias("n_lines")))


@_q("forward_fill_correlation", """
SELECT event_id,
       last_value(CASE WHEN event_type = 'signup'
                       THEN 'corr-' || CAST(user_id AS VARCHAR) END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS correlation_id
FROM events
""")
def q_ffill_corr(spark, sf_dir):
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events").withColumn(
        "corr_src", F.when(F.col("event_type") == "signup",
                           F.concat(F.lit("corr-"), F.col("user_id").cast("string"))))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.withColumn("correlation_id",
                         F.last("corr_src", ignorenulls=True).over(w)) \
        .select("event_id", "correlation_id")


# =========================================================================
# §2.5 routing fan-out + per-sink aggregates (the baseline's core check)
# =========================================================================

ROUTING_ORACLE_CASE = """
  CASE WHEN event_type = 'error' THEN 'errors'
       WHEN event_type = 'purchase' AND value > 30 THEN 'big_purchase'
       WHEN value > 45 THEN 'high_value'
       ELSE 'bulk' END
"""


def _routed_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return R.route(ev, [
        ("errors", F.col("event_type") == "error"),
        ("big_purchase", (F.col("event_type") == "purchase") & (F.col("value") > 30)),
        ("high_value", F.col("value") > 45),
    ], default="bulk")


@_q("routing_fanout", f"""
SELECT {ROUTING_ORACLE_CASE} AS sink, COUNT(*) AS rows
FROM events GROUP BY 1
""")
def q_routing(spark, sf_dir):
    return R.sink_counts(_routed_events(spark, sf_dir))


@_q("routing_rows", f"""
SELECT event_id, {ROUTING_ORACLE_CASE} AS sink FROM events
""")
def q_routing_rows(spark, sf_dir):
    return _routed_events(spark, sf_dir) \
        .select("event_id", F.col(R.ROUTE_COL).alias("sink"))


@_q("per_sink_aggregates", f"""
SELECT sink, event_type, COUNT(*) AS count, SUM(value) AS sum_value
FROM (SELECT *, {ROUTING_ORACLE_CASE} AS sink FROM events)
GROUP BY sink, event_type
""")
def q_per_sink_agg(spark, sf_dir):
    routed = _routed_events(spark, sf_dir)
    return (routed.groupBy(F.col(R.ROUTE_COL).alias("sink"), "event_type")
            .agg(F.count("*").alias("count"), F.sum("value").alias("sum_value")))


@_q("statsd_metrics", """
SELECT 'events.' || event_type AS metric_key,
       COUNT(*) AS counter, SUM(value) AS timer_sum
FROM events GROUP BY event_type
""")
def q_statsd(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.concat(F.lit("events."), F.col("event_type"))
                       .alias("metric_key"))
            .agg(F.count("*").alias("counter"), F.sum("value").alias("timer_sum")))


# =========================================================================
# Relational competence (joins / aggs at TPC-H shapes)
# =========================================================================

@_q("pricing_summary", """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base_price,
       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("2024-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base_price"),
                 F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


@_q("segment_order_stats", """
SELECT c.c_mktsegment, COUNT(*) AS n_orders, SUM(o.o_totalprice) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""")
def q_segment(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.sum("o_totalprice").alias("revenue")))


@_q("nation_region_rollup", """
SELECT r.r_name, COUNT(*) AS n_customers, SUM(c.c_acctbal) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def q_nation_region(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_customers"),
                 F.sum("c_acctbal").alias("total_bal")))
