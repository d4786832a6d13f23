from pyspark.sql import functions as F


def _src(spark, sf_dir):
    from pastash_spark.queries import q_janus_trace_spans
    return q_janus_trace_spans(spark, sf_dir)


def new(spark, sf_dir):
    return _src(spark, sf_dir)


def old(spark, sf_dir):
    import pastash_spark.queries as Q
    from pastash_spark.operators import correlate_old as C
    orig = Q.C
    Q.C = C
    try:
        return Q.q_janus_trace_spans(spark, sf_dir)
    finally:
        Q.C = orig


def probes():
    return {"old": old, "new": new}
