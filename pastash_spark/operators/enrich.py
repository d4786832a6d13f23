"""Enrichment operators: broadcast lookups, range joins, as-of state lookups
(SURVEY.md §2.2 — geoip/ipproto/reverse_dns/lru/gun patterns).

The reference enriches via per-filter LRU caches around expensive lookups
(/root/reference/lib/lib/cache_helper.js:30-47).  The Spark-native shape is a
**broadcast hash join** against the lookup table — build side shipped once per
executor, probe side streamed through codegen; the cache disappears because
the "lookup" is a hash probe.  For keyed mutable state (the lru/gun set/get
correlation pattern) the batch equivalent is an ordered window
``last(value) ignorenulls`` — an as-of lookup.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(df: DataFrame, lookup: DataFrame, on: str | Sequence[str],
                     *, how: str = "left") -> DataFrame:
    """Generic broadcast-join enrichment (the ipproto/geoip dict pattern,
    filter_ipproto.js:41-53 / filter_geoip.js:117-136).

    Always broadcasts the lookup side: enrichment dims are small by
    construction, and a broadcast join is shuffle-free on the fact side —
    the property that keeps this O(rows) at 100 TB regardless of key skew
    (skewed probe keys are harmless when nothing repartitions by them).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return df.join(F.broadcast(lookup), on=keys, how=how)


def range_lookup(df: DataFrame, ranges: DataFrame, value_col: str,
                 lo_col: str = "range_start", hi_col: str = "range_end") -> DataFrame:
    """IP-range style enrichment: value BETWEEN lo AND hi against a broadcast
    range table (the maxmind geoip block-file model, filter_geoip.js:88-143).
    Broadcast keeps it a nested-loop probe per executor — fine for the
    classic ~300k-block geo table; beyond that, bucketize the value into a
    prefix key first and equi-join on the prefix."""
    cond = (F.col(value_col) >= ranges[lo_col]) & (F.col(value_col) <= ranges[hi_col])
    return df.join(F.broadcast(ranges), on=cond, how="left")


def range_lookup_bucketed(df: DataFrame, ranges: DataFrame, value_col: str,
                          lo_col: str = "range_start",
                          hi_col: str = "range_end", *,
                          bucket_bits: int = 16,
                          broadcast: bool = True,
                          how: str = "left") -> DataFrame:
    """Equi-join formulation of the range join — the scale path when the
    range table outgrows a nested-loop probe (a real maxmind block file is
    3-4M ranges; BNLJ would evaluate facts x ranges).

    Each range explodes to the fixed-width prefix buckets it covers
    (bucket = value >> bucket_bits, the /16-style trick for IPv4-as-int);
    facts compute their own bucket, and the join becomes a plain HASH
    equi-join on the bucket with BETWEEN as a residual filter — never a
    BroadcastNestedLoopJoin (pinned by test_plan_shapes).  Non-overlapping
    ranges (the geoip block contract) give <= 1 match per fact, so row
    multiplicity is preserved.  ``broadcast=False`` falls back to a shuffle
    hash join for expanded range tables too big to broadcast.
    """
    v = F.col(value_col).cast("long")
    r = ranges.withColumn(
        "_bkt", F.explode(F.sequence(
            F.shiftright(F.col(lo_col).cast("long"), bucket_bits),
            F.shiftright(F.col(hi_col).cast("long"), bucket_bits))))
    if broadcast:
        r = F.broadcast(r)
    fact = df.withColumn("_bkt", F.shiftright(v, bucket_bits))
    cond = ((fact["_bkt"] == r["_bkt"]) &
            (v >= r[lo_col]) & (v <= r[hi_col]))
    return fact.join(r, on=cond, how=how) \
        .drop(fact["_bkt"]).drop(r["_bkt"])


PRIVATE_IP_RE = r"^(10\.|192\.168\.|172\.(1[6-9]|2[0-9]|3[01])\.|127\.0\.0\.1)"


def is_private_ip(col) -> "F.Column":
    """The reference's private-range guard (filter_geoip.js:90-110) as a
    single predicate column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.rlike(PRIVATE_IP_RE), F.lit(False))


def geoip(df: DataFrame, geo_table: DataFrame, *, ip_field: str = "ip",
          how: str = "left") -> DataFrame:
    """geoip enrichment: broadcast join on ip, skipping private ranges
    (filter_geoip.js:88-143).  ``geo_table`` carries (ip, country, city, ...)
    — private IPs keep NULL attributes without probing the table."""
    pub = df.withColumn("_geo_key",
                        F.when(~is_private_ip(ip_field), F.col(ip_field)))
    joined = pub.join(F.broadcast(geo_table.withColumnRenamed("ip", "_geo_key")),
                      on="_geo_key", how=how)
    return joined.drop("_geo_key")


def reverse_dns(df: DataFrame, *, field: str = "host",
                target: str = "hostname", only_hostname: bool = False,
                resolver=None) -> DataFrame:
    """PTR-lookup enrichment (filter_reverse_dns.js:40-54).

    Batch resolution via ``mapInPandas`` with a per-partition memo dict — the
    distributed analogue of the reference's process-wide LRU
    (cache_helper.js:30-47): each executor resolves each distinct IP once per
    partition.  ``resolver`` injects the lookup (tests pass a dict/callable);
    the default uses ``socket.gethostbyaddr`` guarded by try/except so
    offline environments yield NULL instead of failing.
    """
    schema_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{target}` string"])

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, str | None] = {}

        def one(v):
            if v is None:
                return None
            if v not in memo:
                if resolver is not None:
                    memo[v] = resolver(v) if callable(resolver) else resolver.get(v)
                else:
                    try:
                        import socket
                        memo[v] = socket.gethostbyaddr(v)[0]
                    except OSError:
                        memo[v] = None
            return memo[v]

        for pdf in batches:
            out = pdf.copy()
            out[target] = pdf[field].map(one)
            yield out

    out = df.mapInPandas(resolve, schema=schema_ddl)
    if only_hostname:
        out = out.withColumn(target, F.split(F.col(target), r"\.")[0])
    return out


def asof_lookup(df: DataFrame, *, key: str | Sequence[str], order: str,
                is_set, value, target: str) -> DataFrame:
    """The lru/gun set→get correlation pattern as a window as-of lookup
    (filter_lru.js:27-43, gun_helper.js:4-37): rows where ``is_set`` holds
    publish ``value`` under ``key``; every row reads the latest published
    value at its position in ``order``.

    last(value) ignorenulls over (partition by key order by order) — one
    shuffle on the key, no driver state.  TTL semantics (maxAge) belong to
    the streaming variant (streaming/state.py) where watermarks bound state.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (Window.partitionBy(*keys).orderBy(F.col(order))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    published = F.when(is_set, value)
    return df.withColumn(target, F.last(published, ignorenulls=True).over(w))
