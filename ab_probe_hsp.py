"""Stage probes for hsp_scored_correlation."""
from pyspark.sql import functions as F


def _legs(spark, sf_dir):
    from pastash_spark.queries import _t
    ev = _t(spark, sf_dir, "events").select("event_id")
    c1 = F.concat(F.lit("c"), F.col("event_id").cast("string"))
    return (ev.select(F.explode(F.array(
        F.struct((F.col("event_id") * 2).alias("ord"), c1.alias("callid")),
        F.struct((F.col("event_id") * 2 + 1).alias("ord"),
                 F.concat(c1, F.lit("_b2b-1")).alias("callid"))))
        .alias("_r"))
        .select(F.col("_r.ord").alias("ord"),
                F.col("_r.callid").alias("callid")))


def legs(spark, sf_dir):
    return _legs(spark, sf_dir)


def handles(spark, sf_dir):
    from pastash_spark.operators.hsp import HSP_VECTORS
    df = _legs(spark, sf_dir)
    val = F.col("callid").cast("string")
    gate = val.isNotNull() & (val != "")
    h0 = F.when(gate, F.struct(F.lit("callid").alias("hname"),
                               val.alias("hval"),
                               F.lit(100).alias("hscore")))
    h1 = F.when(gate, F.struct(F.lit("callid").alias("hname"),
                               F.concat(val, F.lit("_b2b-1")).alias("hval"),
                               F.lit(100).alias("hscore")))
    hd = df.select(F.col("ord").alias("_o"),
                   F.col("callid").cast("string").alias("_id"),
                   h0.alias("_h0"), h1.alias("_h1"))
    return (hd.select("_o", "_id",
                      F.explode(F.array("_h0", "_h1")).alias("_h"))
            .filter(F.col("_h").isNotNull())
            .select("_o", "_id", F.col("_h.hname").alias("hname"),
                    F.col("_h.hval").alias("hval"),
                    F.col("_h.hscore").alias("hscore")))


def capped(spark, sf_dir):
    from pyspark.sql import Window
    h = handles(spark, sf_dir)
    w = Window.partitionBy("hname", "hval").orderBy("_o")
    return (h.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 64).drop("_rn"))


def occ(spark, sf_dir):
    h = capped(spark, sf_dir)
    return (h.groupBy("hname", "hval")
            .agg(F.sort_array(F.collect_list(
                F.struct("_o", "_id", "hscore"))).alias("_occ")))


def pairs(spark, sf_dir):
    o = occ(spark, sf_dir)
    e1 = o.select("hname", "_occ",
                  F.posexplode("_occ").alias("_i", "_a"))
    e2 = (e1.select("hname",
                    F.col("_a._o").alias("_ao"),
                    F.col("_a._id").alias("_aid"),
                    F.col("_a.hscore").alias("_as"),
                    F.explode(F.slice("_occ", F.col("_i") + 2,
                                      F.size("_occ"))).alias("_b"))
          .filter(F.col("_ao") < F.col("_b._o")))
    bp = e2.select("_ao", "_aid", F.col("_b._o").alias("_bo"), "hname",
                   F.greatest("_as", F.col("_b.hscore")).alias("_ns"))
    return (bp.groupBy("_ao", "_bo", "_aid")
            .agg(F.max(F.when(F.col("hname") == "callid", F.col("_ns")))
                 .alias("_m0"))
            .withColumn("_score", F.coalesce(F.col("_m0"), F.lit(0)))
            .filter(F.col("_score") >= 100))


def full(spark, sf_dir):
    from pastash_spark.queries import q_hsp_scored_correlation
    return q_hsp_scored_correlation(spark, sf_dir)


def probes():
    return {"legs": legs, "handles": handles, "capped": capped,
            "occ": occ, "pairs": pairs, "full": full}
