"""pastash_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the *capabilities* of sipcapture/paStash
(reference: /root/reference, v1.0.82) on Spark's DataFrame/Catalyst engine:

    inputs  -> parse -> interpolate/enrich -> correlate -> route -> sinks

paStash executes a linked list of per-event JS callbacks
(/root/reference/lib/agent.js:254-282); this engine instead declares the same
semantics as a lazy DataFrame DAG so Catalyst/Tungsten handle predicate
pushdown, column pruning, whole-stage codegen, and shuffle planning.  All hot
paths are native `pyspark.sql.functions` expressions or Arrow-vectorized
pandas UDFs — never per-row Python.

Layout
------
functions/   expression compilers: #{field} interpolation, condition DSL,
             numeric coercion, grok->regex compiler
operators/   parse / mutate / enrich / correlate / route (DataFrame -> DataFrame)
sources/     readers, checkpointed incremental scans, partitioned sinks
plans/       pipeline spec -> composed DataFrame DAG (the config layer)
streaming/   Structured Streaming variants (stateful multiline / cacheloop)
"""

__version__ = "0.1.0"
