from pyspark.sql import functions as F


def _both(spark, sf_dir):
    from pastash_spark.queries import _t
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return (emb.select(F.explode(F.array(
        F.struct(F.col("vec_id"), F.col("embedding")),
        F.when(F.col("vec_id") % 10 == 0, F.struct(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 0.9 + 0.01)
            .alias("embedding"))))).alias("_r"))
        .filter(F.col("_r").isNotNull())
        .select(F.col("_r.vec_id").alias("vec_id"),
                F.col("_r.embedding").alias("embedding")))


def emb_new(spark, sf_dir):
    from pastash_spark.operators import similarity as S
    return S.lsh_near_dup_pairs(_both(spark, sf_dir), threshold=0.9,
                                n_tables=3, n_planes=8, dim=64)


def emb_old(spark, sf_dir):
    from pastash_spark.operators import similarity_old as S
    return S.lsh_near_dup_pairs(_both(spark, sf_dir), threshold=0.9,
                                n_tables=3, n_planes=8, dim=64)


def sim_new(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset as D
    return D.simhash_near_pairs(_with_dups(spark, sf_dir), max_hamming=3)


def sim_old(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset_old as D
    return D.simhash_near_pairs(_with_dups(spark, sf_dir), max_hamming=3)


def probes():
    return {"emb_old": emb_old, "emb_new": emb_new,
            "sim_old": sim_old, "sim_new": sim_new}


def jac_new(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset as D
    return D.ngram_jaccard_pairs(_with_dups(spark, sf_dir), k=3,
                                 threshold=0.5)


def jac_old(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset_old as D
    return D.ngram_jaccard_pairs(_with_dups(spark, sf_dir), k=3,
                                 threshold=0.5)


def probes_jac():
    return {"jac_old": jac_old, "jac_new": jac_new}


def mh_pairs_new(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset as D
    docs = _with_dups(spark, sf_dir)
    work = D.dedup_exact_keep(docs)
    return D.minhash_lsh_pairs(work)


def mh_pairs_old(spark, sf_dir):
    from pastash_spark.queries import _with_dups
    from pastash_spark.operators import dataset_old as D
    docs = _with_dups(spark, sf_dir)
    work = D.dedup_exact_keep(docs)
    return D.minhash_lsh_pairs(work)


def probes_mh():
    return {"mhp_old": mh_pairs_old, "mhp_new": mh_pairs_new}


def emb_nobase(spark, sf_dir):
    # drop only the base ckpt: _reuse becomes identity for the FIRST call
    import pastash_spark.operators.dataset as dmod
    from pastash_spark.operators import similarity as S
    orig = dmod._reuse
    calls = {"n": 0}

    def selective(df, enabled):
        calls["n"] += 1
        if calls["n"] == 1:
            return df
        return orig(df, enabled)
    dmod._reuse = selective
    try:
        return S.lsh_near_dup_pairs(_both(spark, sf_dir), threshold=0.9,
                                    n_tables=3, n_planes=8, dim=64)
    finally:
        dmod._reuse = orig


def probes_emb2():
    return {"emb_cur": emb_new, "emb_nobase": emb_nobase}


def probes_sim_only():
    return {"sim_old": sim_old, "sim_new": sim_new}
