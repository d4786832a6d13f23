from pyspark.sql import functions as F


def _src(spark, sf_dir):
    from pastash_spark.queries import _janus_events
    return _janus_events(spark, sf_dir)


def new(spark, sf_dir):
    from pastash_spark.operators import correlate as C
    return C.app_janus_correlate(_src(spark, sf_dir)).select(
        "event_id", "type", "session_id", "opaque_id",
        "media_ip", "media_port")


def old(spark, sf_dir):
    from pastash_spark.operators import correlate_old as C
    return C.app_janus_correlate(_src(spark, sf_dir)).select(
        "event_id", "type", "session_id", "opaque_id",
        "media_ip", "media_port")


def probes():
    return {"old": old, "new": new}
