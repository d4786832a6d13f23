from pyspark.sql import functions as F


def new(spark, sf_dir):
    from pastash_spark.queries import q_esl
    return q_esl(spark, sf_dir)


def old(spark, sf_dir):
    from pastash_spark.queries import _t, _epoch
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("call-"), F.col("user_id").cast("string"))
        .alias("correlation_id"),
        "ts", "event_id",
        F.when(F.col("event_type") == "signup", "CHANNEL_CREATE")
        .when(F.col("event_type") == "purchase", "CHANNEL_ANSWER")
        .when(F.col("event_type") == "error", "CHANNEL_DESTROY")
        .otherwise("MEDIA").alias("event_name"),
        F.col("value").alias("metric"))
    key, ts, event, metric = "correlation_id", "ts", "event_name", "metric"
    w = (Window.partitionBy(key).orderBy(F.col(ts))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    enriched = (ev
                .withColumn("_created",
                            F.last(F.when(F.col(event) == "CHANNEL_CREATE",
                                          F.col(ts)), ignorenulls=True).over(w))
                .withColumn("_answered",
                            F.last(F.when(F.col(event) == "CHANNEL_ANSWER",
                                          F.col(ts)), ignorenulls=True).over(w)))
    out = (enriched.groupBy(key)
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
    out = out.withColumn("avg_metric", F.round("avg_metric", 6))
    return out.select(
        "correlation_id",
        _epoch(F.col("created_at")).cast("long").alias("created_s"),
        _epoch(F.col("answered_at")).cast("long").alias("answered_s"),
        _epoch(F.col("destroyed_at")).cast("long").alias("destroyed_s"),
        "n_events", "avg_metric", "answered", "duration_sec")


def probes():
    return {"old": old, "new": new}
