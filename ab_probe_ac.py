"""Stage-isolation probes for audiocodes_sip_parse (guide §1.4)."""
from pyspark.sql import functions as F


def _src(spark, sf_dir):
    from pastash_spark.queries import _t
    ev = _t(spark, sf_dir, "events")
    line = F.concat(
        F.lit("[S="), F.col("event_id").cast("string"),
        F.lit("] [SID=mac:1:s"), F.col("event_id").cast("string"),
        F.lit("] ---- Incoming SIP Message from 10.0."),
        (F.col("user_id") % 200).cast("string"), F.lit("."),
        (F.col("event_id") % 200).cast("string"),
        F.lit(":5060 to SIPInterface #0 (GRP) UDP TO(#1) ---"),
        F.lit("#012INVITE sip:u"), (F.col("user_id") % 10).cast("string"),
        F.lit("@x SIP/2.0#012Call-ID: cid-"),
        F.col("event_id").cast("string"),
        F.lit("#012 #012 [Time:04-05@1]"))
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 != 0, line)
        .otherwise(F.lit("plain device chatter")).alias("message"))


def render(spark, sf_dir):
    return _src(spark, sf_dir)


def matcher(spark, sf_dir):
    from pastash_spark.operators.correlate import _ac_matcher_udf
    in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
             r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012(.*)")
    out_re = (r"(.*) ---- Outgoing SIP Message to (.*) from SIPInterface "
              r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012 (.*)")
    m = _ac_matcher_udf(in_re, out_re)
    line0 = F.replace(F.col("message"), F.lit("\r\n"), F.lit("#012"))
    return _src(spark, sf_dir).select(
        "event_id", m(line0).alias("_p"))


def windows(spark, sf_dir):
    """matcher + the w_seq lead/lag block, no slot building."""
    from pyspark.sql import Window
    from pastash_spark.operators.correlate import _ac_matcher_udf
    in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
             r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012(.*)")
    out_re = (r"(.*) ---- Outgoing SIP Message to (.*) from SIPInterface "
              r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012 (.*)")
    mat = _ac_matcher_udf(in_re, out_re)
    order = "event_id"
    line0 = F.replace(F.col("message"), F.lit("\r\n"), F.lit("#012"))
    base = (_src(spark, sf_dir)
            .select(F.col(order), line0.alias("_l"))
            .withColumn("_p", mat(F.col("_l")))
            .withColumn("_s", F.col("_p.s"))
            .withColumn("sid", F.col("_p.sid")))
    w_seq = Window.partitionBy("sid").orderBy(F.col(order))
    base = (base.withColumn("_ns", F.lead("_s", 1).over(w_seq))
            .withColumn("_nl", F.lead("_l", 1).over(w_seq))
            .withColumn("_ph", F.lag("_s", 1).over(w_seq)))
    return base.select(order, "sid", "_ns", "_ph",
                       F.length("_nl").alias("_nll"))


def full(spark, sf_dir):
    from pastash_spark.queries import q_audiocodes_sip
    return q_audiocodes_sip(spark, sf_dir)


def probes():
    return {"render": render, "matcher": matcher, "windows": windows,
            "full": full}


def _base_for_pm(spark, sf_dir):
    from pyspark.sql import Window
    from pastash_spark.operators.correlate import _ac_matcher_udf
    in_re = (r"(.*)---- Incoming SIP Message from (.*) to SIPInterface "
             r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012(.*)")
    out_re = (r"(.*) ---- Outgoing SIP Message to (.*) from SIPInterface "
              r"#[0-9] \((.*)\) (.*) TO.*---\s?#012(.*)#012\s?#012 (.*)")
    mat = _ac_matcher_udf(in_re, out_re)
    order = "event_id"
    line0 = F.replace(F.col("message"), F.lit("\r\n"), F.lit("#012"))
    base = (_src(spark, sf_dir)
            .select(F.col(order), line0.alias("_l"))
            .withColumn("_p", mat(F.col("_l")))
            .withColumn("_s", F.col("_p.s"))
            .withColumn("sid", F.col("_p.sid")))
    w_seq = Window.partitionBy("sid").orderBy(F.col(order))
    tail_re = r".*\[S=[0-9]+\].*?\[SID=.*?\]\s?(.*)\[Time:.*\]"
    base = (base.withColumn("_ns", F.lead("_s", 1).over(w_seq))
            .withColumn("_nl", F.lead("_l", 1).over(w_seq)))
    nxt_mtail = F.regexp_extract(F.col("_nl"), tail_re, 1)
    can_merge = F.col("_ns") == F.col("_s") + 1
    merged = F.concat(F.regexp_replace(F.col("_l"), r"\[Time.*\]$", ""),
                      F.when(F.col("_nl").isNotNull(), nxt_mtail)
                      .otherwise(F.lit("")))
    incomplete = ((F.col("_l").contains("Incoming SIP Message")
                   | F.col("_l").contains("Outgoing SIP Message"))
                  & (F.col("_p.hit") == 0))
    merge_cond = incomplete & can_merge
    return base, merged, merge_cond, mat, in_re, out_re


def pm_arrow(spark, sf_dir):
    base, merged, mc, mat, _, _ = _base_for_pm(spark, sf_dir)
    return base.withColumn("_pm", mat(F.when(mc, merged))) \
        .select("event_id", F.col("_pm.hit").alias("h"))


def pm_native(spark, sf_dir):
    from pastash_spark.operators.correlate import _ac_native_reparse
    base, merged, mc, _, in_re, out_re = _base_for_pm(spark, sf_dir)
    return base.withColumn("_pm", _ac_native_reparse(
        F.when(mc, merged), in_re, out_re)) \
        .select("event_id", F.col("_pm.hit").alias("h"))


def probes_pm():
    return {"pm_arrow": pm_arrow, "pm_native": pm_native, "full": full}


def full_noqos(spark, sf_dir):
    from pastash_spark.operators import correlate as C
    src = _src(spark, sf_dir)
    out = C.app_audiocodes_correlate(src, order="event_id",
                                     partition_by_sid=True, qos=False,
                                     localip="1.1.1.1", localport=5060)
    return out.select("event_id", "sid", "proto_type", "payload",
                      "correlation_id", "src_ip", "src_port", "dst_ip",
                      "dst_port", "protocol")


def probes_qos():
    return {"full": full, "full_noqos": full_noqos}


def full_old(spark, sf_dir):
    from pastash_spark.operators import correlate_old as C
    src = _src(spark, sf_dir)
    out = C.app_audiocodes_correlate(src, order="event_id",
                                     partition_by_sid=True,
                                     localip="1.1.1.1", localport=5060)
    return out.select("event_id", "sid", "proto_type", "payload",
                      "correlation_id", "src_ip", "src_port", "dst_ip",
                      "dst_port", "protocol")


def probes_oldnew():
    return {"old": full_old, "new": full}
