"""Stage-isolation probes for rtpproxy_correlate (guide §1.4)."""
from pyspark.sql import functions as F


def _lines(spark, sf_dir):
    from pastash_spark.queries import _t
    ev = _t(spark, sf_dir, "events")
    pts = F.element_at(F.array(*[F.lit(x) for x in
                                 (0, 3, 8, 9, 18, 34, 101, 96)]),
                       (F.col("event_id") % 8 + 1).cast("int"))
    mode = F.when(F.col("user_id") % 2 == 1, "L").otherwise("U")
    cmd = F.concat(F.lit('received command "tok'),
                   F.col("event_id").cast("string"), F.lit(" "), mode,
                   F.lit("c"), pts.cast("string"),
                   F.lit(",101 corr-"), F.col("event_id").cast("string"),
                   F.lit('@h 1 2"'))
    rep = F.concat(F.lit('sending reply "tok'),
                   F.col("event_id").cast("string"), F.lit(" "),
                   (30000 + F.col("event_id") % 1000).cast("string"),
                   F.lit(" 10.1.0."), (F.col("event_id") % 250).cast("string"),
                   F.lit("#012"))
    return (ev.select(F.explode(F.array(
        F.struct((F.col("event_id") * 2).alias("ord"),
                 cmd.alias("message")),
        F.struct((F.col("event_id") * 2 + 1).alias("ord"),
                 rep.alias("message")))).alias("_r"))
        .select(F.col("_r.ord").alias("ord"),
                F.col("_r.message").alias("message")))


def render_only(spark, sf_dir):
    return _lines(spark, sf_dir)


def matcher_only(spark, sf_dir):
    from pastash_spark.operators.correlate import _rtp_matcher_udf
    m = _rtp_matcher_udf()
    return _lines(spark, sf_dir).select(
        "ord", m(F.col("message").cast("string")).alias("_m"))


def full(spark, sf_dir):
    from pastash_spark.queries import q_rtpproxy
    return q_rtpproxy(spark, sf_dir)


def probes():
    return {"render": render_only, "matcher": matcher_only, "full": full}


def full_noreuse(spark, sf_dir):
    from pastash_spark.operators import correlate as C
    return C.app_rtpproxy_correlate(_lines(spark, sf_dir), order="ord",
                                    reuse=False).select(
        ((F.col("ord") - 1) / 2).cast("long").alias("event_id"),
        "method", "token", "correlation_id", "codec_name",
        "codec_pt", "codec_rate", "direction", "port", "ip")


def probes2():
    return {"full": full, "full_noreuse": full_noreuse,
            "matcher": matcher_only}


def _stage(spark, sf_dir, upto):
    from pastash_spark.operators.correlate import _rtp_matcher_udf
    from pastash_spark.operators.dataset import _reuse
    from pastash_spark.operators.correlate import RTP_CODEC_MAP
    from pyspark.sql import Window
    order = "ord"
    matcher = _rtp_matcher_udf()
    df = _reuse(_lines(spark, sf_dir).select(
        F.col(order), matcher(F.col("message").cast("string")).alias("_m")),
        True)
    if upto == "ckpt":
        return df
    m = F.col("_m")

    def _fam(token_field, ord_alias, *fields):
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
        F.coalesce(codec_map[pt], F.lit(None)).alias("codec_name"),
        F.coalesce(pt, F.lit(None)).alias("codec_pt"),
        F.lit(8000).alias("codec_rate"),
        F.when(F.col("_mode") == "L", 1).otherwise(0).alias("direction"))
    tok_replies = _fam("r_token", "_r_ord",
                       ("r_token", "token"), ("r_port", "port"),
                       ("r_ip", "ip"))
    if upto == "fams":
        return creates.unionByName(tok_replies, allowMissingColumns=True)
    ns = F.lit(None).cast("string")
    merged = (creates.select("token", F.col("_c_ord").alias("_ord"),
                             F.lit(True).alias("_isc"), "correlation_id",
                             "codec_name", "codec_pt", "codec_rate",
                             "direction", ns.alias("port"), ns.alias("ip"))
              .unionByName(tok_replies.select(
                  "token", F.col("_r_ord").alias("_ord"),
                  F.lit(False).alias("_isc"),
                  ns.alias("correlation_id"), ns.alias("codec_name"),
                  F.lit(None).cast("int").alias("codec_pt"),
                  F.lit(None).cast("int").alias("codec_rate"),
                  F.lit(None).cast("int").alias("direction"),
                  "port", "ip")))
    merged = merged.withColumn(
        "_cr", F.when(F.col("_isc"), F.struct(
            "correlation_id", "codec_name", "codec_pt", "codec_rate",
            "direction", F.col("_ord").alias("_c_ord"))))
    w_fill = Window.partitionBy("token").orderBy("_ord")
    paired = (merged
              .withColumn("_f", F.last("_cr", ignorenulls=True).over(w_fill))
              .filter(~F.col("_isc") & F.col("_f").isNotNull())
              .withColumn("_fc", F.col("_f._c_ord")))
    w_first = Window.partitionBy("token", "_fc").orderBy("_ord")
    paired = (paired.withColumn("_rn", F.row_number().over(w_first))
              .filter(F.col("_rn") == 1))
    created = paired.select(
        F.lit("create").alias("method"),
        F.col("_f.correlation_id").alias("correlation_id"), "token",
        F.col("_f.codec_name").alias("codec_name"),
        F.col("_f.codec_pt").alias("codec_pt"),
        F.col("_f.codec_rate").alias("codec_rate"),
        F.col("_f.direction").alias("direction"), "port", "ip",
        F.col("_ord").alias(order))
    return created


def st_ckpt(spark, sf_dir):
    return _stage(spark, sf_dir, "ckpt")


def st_fams(spark, sf_dir):
    return _stage(spark, sf_dir, "fams")


def st_created(spark, sf_dir):
    return _stage(spark, sf_dir, "created")


def probes3():
    return {"ckpt": st_ckpt, "fams": st_fams, "created": st_created,
            "full": full}


def _full_var(spark, sf_dir, ckpt_created):
    from pastash_spark.operators.dataset import _reuse
    from pyspark.sql import Window
    order = "ord"
    created = _stage(spark, sf_dir, "created")
    if ckpt_created:
        created = _reuse(created, True)
    # re-derive df/m for cleans (matches operator body)
    from pastash_spark.operators.correlate import _rtp_matcher_udf
    matcher = _rtp_matcher_udf()
    df = _reuse(_lines(spark, sf_dir).select(
        F.col(order), matcher(F.col("message").cast("string")).alias("_m")),
        True)
    m = F.col("_m")
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


def full_ckpt(spark, sf_dir):
    return _full_var(spark, sf_dir, True)


def full_nockpt(spark, sf_dir):
    return _full_var(spark, sf_dir, False)


def probes4():
    return {"full_ckpt": full_ckpt, "full_nockpt": full_nockpt}


def full_old(spark, sf_dir):
    from pastash_spark.operators import correlate_old as C
    return C.app_rtpproxy_correlate(_lines(spark, sf_dir), order="ord").select(
        ((F.col("ord") - 1) / 2).cast("long").alias("event_id"),
        "method", "token", "correlation_id", "codec_name",
        "codec_pt", "codec_rate", "direction", "port", "ip")


def probes_oldnew():
    return {"old": full_old, "new": full}
