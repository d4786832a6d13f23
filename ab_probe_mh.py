"""Stage-isolation probes for minhash_lsh_dedup (guide §1.4)."""
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    return _with_dups(spark, sf_dir)


def src(spark, sf_dir):
    return _docs(spark, sf_dir)


def sig(spark, sf_dir):
    from pastash_spark.operators.dataset import minhash_signature
    return _docs(spark, sf_dir).select(
        "doc_id", minhash_signature("text", 3, 64).alias("sig"))


def reps(spark, sf_dir):
    from pastash_spark.operators.dataset import dedup_exact_keep
    return dedup_exact_keep(_docs(spark, sf_dir))


def cand(spark, sf_dir):
    from pastash_spark.operators.dataset import (minhash_lsh_pairs,
                                                 dedup_exact_keep, _reuse)
    slim = _reuse(_docs(spark, sf_dir).select("doc_id", "text"), True)
    rp = _reuse(dedup_exact_keep(slim), True)
    work = rp.select("doc_id", "text")
    return minhash_lsh_pairs(work)


def full(spark, sf_dir):
    from pastash_spark.queries import q_minhash
    return q_minhash(spark, sf_dir)


def probes():
    return {"src": src, "sig": sig, "reps": reps, "cand": cand,
            "full": full}


def cand2(spark, sf_dir):
    from pastash_spark.operators.dataset import (minhash_lsh_pairs,
                                                 fingerprint, _reuse)
    from pyspark.sql import Window
    docs = _docs(spark, sf_dir)
    w_fp = Window.partitionBy(fingerprint("text")).orderBy(F.col("doc_id"))
    marked = _reuse(docs.select("doc_id", "text")
                    .withColumn("_rn", F.row_number().over(w_fp)), True)
    work = marked.filter(F.col("_rn") == 1).select("doc_id", "text")
    return minhash_lsh_pairs(work, distinct=False)


def probes2():
    return {"src": src, "sig": sig, "cand2": cand2, "full": full}


def full_nockpt(spark, sf_dir):
    from pastash_spark.operators import dataset as D
    import pastash_spark.operators.dataset as dmod
    orig = dmod._reuse
    dmod._reuse = lambda df, enabled: df
    try:
        return D.dedup_minhash(_docs(spark, sf_dir), threshold=0.5) \
            .select("doc_id")
    finally:
        dmod._reuse = orig


def probes3():
    return {"full": full, "full_nockpt": full_nockpt}
