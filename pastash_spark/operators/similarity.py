"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
variant as the scale path.  Dot products stay JVM-side via F.aggregate /
zip_with — no Python in the scoring loop.  At 100 TB the broadcast of the
query set is the key property: scoring is a map-only pass over the corpus
(one scan, zero shuffle), and only the per-partition top-k survivors reach
the final top-k reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score map-side, then a single top-k window per query.

    Output: (query_id, neighbor_id, rank) with rank 1..k — ids and ranks
    only, so results are engine-portable (no float in the compared output).
    Ties break on neighbor_id for determinism.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("_sim", cosine(
                  F.col("_qv").cast("array<double>"),
                  F.col("_cv").cast("array<double>"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.col("_sim").alias("sim")))


def random_projection_buckets(df: DataFrame, *, vec_col: str = "embedding",
                              n_planes: int = 8, seed: int = 42,
                              dim: int | None = None) -> DataFrame:
    """Sign-random-projection LSH bucket id (SimHash for vectors): bucket =
    bits of sign(v . r_i) for n deterministic pseudo-random hyperplanes.

    Hyperplanes derive from splitmix-style integer mixing of (seed, plane,
    component) entirely in column expressions, so executors need no
    broadcast state and the bucketing is reproducible across runs/engines.
    """
    if dim is None:
        raise ValueError("pass dim= (embedding dimensionality)")

    def plane_component(p: int, j) -> "F.Column":
        # deterministic pseudo-random in [-0.5, 0.5): hash(seed, p, j)
        h = F.xxhash64(F.lit(seed), F.lit(p), j)
        return (F.pmod(h, F.lit(1_000_003)).cast("double") / 1_000_003.0) - 0.5

    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.transform(v, lambda x, j: x * plane_component(p, j)),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long")))
    return df.withColumn("bucket", bucket)


def lsh_topk(corpus: DataFrame, queries: DataFrame, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 10, n_planes: int = 8, dim: int | None = None) -> DataFrame:
    """Approximate top-k: score only within matching random-projection
    buckets — the candidate join is an equi-join on bucket, so corpus scan
    cost is unchanged but pair count drops ~2^n_planes-fold."""
    cb = random_projection_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv")),
        vec_col="_cv", n_planes=n_planes, dim=dim)
    qb = random_projection_buckets(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv")),
        vec_col="_qv", n_planes=n_planes, dim=dim)
    scored = (cb.join(F.broadcast(qb), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("_sim", cosine(
                  F.col("_qv").cast("array<double>"),
                  F.col("_cv").cast("array<double>"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.col("_sim").alias("sim")))
