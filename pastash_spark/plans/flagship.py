"""The flagship end-to-end pipeline: parse -> enrich -> correlate -> route ->
aggregate over the token table (BASELINE.json north rule; the paStash
canonical recipe shape `file -> regex -> compute_field -> if/else ->
{file,file,file}` from /root/reference/test/test_421_logstash/).

One lazy DAG: the grok parse, coercions, enrichment join and routing column
compile into a single stage over the scan (verified via .explain — no
shuffle until the aggregates); the only exchanges are the two aggregate
groupBys, both map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pastash_spark import datagen
from pastash_spark.operators import parse as P
from pastash_spark.operators import route as R
from pastash_spark.operators.enrich import broadcast_lookup

# Grok pattern for the rendered syslog-style header in datagen.token_sequences:
#   <pri>MMM DD HH:mm:ss host prog[pid]: ntok=N first=T doc=ID
HEADER_PATTERN = (
    r"%{SYSLOGPRI}%{SYSLOGTIMESTAMP:ts_txt} %{NOTSPACE:host} "
    r"%{PROG:program}\[%{POSINT:pid}\]: "
    r"ntok=%{INT:hdr_ntok} first=%{INT:hdr_first} doc=%{NOTSPACE:hdr_doc}"
)


def parse_stage(df: DataFrame, *, mode: str = "auto") -> DataFrame:
    """Grok-parse the raw header; decode syslog priority; coerce numerics."""
    df = P.grok(df, HEADER_PATTERN, field="raw",
                numerical_fields=("hdr_ntok", "hdr_first", "pid"), mode=mode)
    df = P.syslog_pri(df, field="syslog_pri")
    return df


def enrich_stage(df: DataFrame, lookup: DataFrame) -> DataFrame:
    """Broadcast source-dim join (shuffle-free on the fact side, so the 40%
    hot `web` key costs nothing extra) + derived quality weight."""
    df = broadcast_lookup(df, lookup, on="source", how="left")
    return df.withColumn(
        "weighted_tokens",
        F.col("n_tok") * F.coalesce(F.col("source_weight"), F.lit(0.0)))


def route_stage(df: DataFrame) -> DataFrame:
    """if / else-if / else fan-out on parsed + enriched fields:
      errors   <- syslog severity <= 3 (err and worse)
      quality  <- route_tag == 'quality'
      code     <- route_tag == 'code'
      bulk     <- everything else (default)
    First-match-wins, mutually exclusive (config_mapper.js:32-58)."""
    return R.route(df, [
        ("errors", F.col("syslog_severity") <= 3),
        ("quality", F.col("route_tag") == "quality"),
        ("code", F.col("route_tag") == "code"),
    ], default="bulk")


def aggregate_stage(routed: DataFrame) -> DataFrame:
    """Per-sink, per-source aggregate (cacheloop count/avg semantics,
    filter_cacheloop.js:52-81) — the per-sink aggregate-count check of the
    baseline."""
    return (routed.groupBy(F.col(R.ROUTE_COL).alias("sink"), "source")
            .agg(F.count("*").alias("count"),
                 F.sum("n_tok").alias("sum_tokens"),
                 F.avg("n_tok").alias("avg_ntok"),
                 F.avg("weighted_tokens").alias("avg_weighted")))


def build(df: DataFrame, lookup: DataFrame, *, mode: str = "auto") -> dict[str, DataFrame]:
    parsed = parse_stage(df, mode=mode)
    enriched = enrich_stage(parsed, lookup)
    routed = route_stage(enriched)
    return {
        "routed": routed,
        "sink_counts": R.sink_counts(routed),
        "aggregates": aggregate_stage(routed),
    }


def run(spark: SparkSession, df: DataFrame | None = None,
        n_rows: int = 10_000, mode: str = "auto") -> dict[str, DataFrame]:
    """Convenience runner on the deterministic synthetic token table."""
    if df is None:
        df = datagen.token_sequences(spark, n_rows)
    lookup = datagen.source_lookup(spark)
    return build(df, lookup, mode=mode)


def token_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the flagship input (input_hint shape + rendered `raw` header)
    from the driver's documents.parquet — everything a deterministic pure
    column expression over (doc_id, text), so the pipeline runs on real
    testdata instead of a synthetic generator."""
    from pastash_spark.operators.dataset import portable_tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    tokens = portable_tokenize("text").cast("array<int>")
    n_tok = F.size(tokens)
    source = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("web", "books", "code", "wiki", "news", "arxiv", "forums",
                   "social", "legal", "patents", "subtitles", "mail")]),
        (F.pmod(d, F.lit(12)) + 1).cast("int"))
    doc_id = F.format_string("doc-%06d-%06d", (d / 1000).cast("long"),
                             F.pmod(d, F.lit(1000)))
    raw = F.concat(
        F.lit("<"), F.pmod(d, F.lit(192)).cast("string"),
        F.lit(">Jan  5 04:05:06 host"), F.pmod(d, F.lit(20)).cast("string"),
        F.lit(" "), source,
        F.lit("["), (1000 + F.pmod(d, F.lit(9000))).cast("string"),
        F.lit("]: ntok="), n_tok.cast("string"),
        F.lit(" first="), F.element_at(tokens, 1).cast("string"),
        F.lit(" doc="), doc_id)
    return docs.select(doc_id.alias("doc_id"), tokens.alias("tokens"),
                       n_tok.alias("n_tok"), source.alias("source"),
                       raw.alias("raw"))
