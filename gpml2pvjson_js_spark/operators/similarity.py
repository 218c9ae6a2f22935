"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: F.zip_with dot product + window row_number
  (the exact baseline; one shuffle for the top-k)
- LSH-bucketed variant (random-hyperplane signs -> bucket join): the
  scale path — candidates only within matching buckets, so the join is
  |bucket|-bounded instead of N^2.

Hyperplanes are derived deterministically from xxhash64 of
(dim, plane) so no RNG state ships to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PLANES = 8


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame,
                           k: int = 5, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """For every query row (q_id, q_vec): exact top-k neighbors by
    cosine. queries is expected to be small relative to the corpus
    (broadcast side)."""
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col("q_id"),
                       F.col("q_vec").cast("array<double>"))
    joined = e.crossJoin(F.broadcast(q))
    cos = _dot(F.col("v"), F.col("q_vec")) / \
        (_norm(F.col("v")) * _norm(F.col("q_vec")))
    scored = joined.withColumn("cosine", cos) \
        .filter(F.col("nbr_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")


def _lsh_signature(vec, dim: int, planes: int):
    """sign bits against deterministic pseudo-random hyperplanes:
    plane p component d = xxhash64(d, p) scaled to [-1, 1]."""
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda d, p=p: (F.xxhash64(d, F.lit(p))
                                            % 2001 - 1000) / 1000.0),
                lambda x, h: x * h),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame,
                    k: int = 5, planes: int = DEFAULT_PLANES,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share a hyperplane-sign bucket.
    Recall < 1 by design; bucket join replaces the cross join."""
    dim_row = embeddings.select(
        F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    e = e.withColumn("bucket", _lsh_signature(F.col("v"), dim, planes))
    q = queries.select("q_id", F.col("q_vec").cast("array<double>"))
    q = q.withColumn("bucket", _lsh_signature(F.col("q_vec"), dim, planes))
    joined = e.join(F.broadcast(q), "bucket") \
        .filter(F.col("nbr_id") != F.col("q_id"))
    cos = _dot(F.col("v"), F.col("q_vec")) / \
        (_norm(F.col("v")) * _norm(F.col("q_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return joined.withColumn("cosine", cos) \
        .withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")
