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


# sign-LSH match probability per table is (1 - theta/pi)^planes, so
# fewer bits per table = higher recall, more tables = OR-amplified
# recall, more bits = better bucket selectivity. 4 bits x 8 tables
# gives ~0.8+ top-k recall on moderately-similar corpora; at larger
# corpus scale raise `planes` (selectivity) and `tables` together.
DEFAULT_LSH_PLANES = 4
DEFAULT_TABLES = 8


def _plane_literal(dim: int, planes: int, table: int):
    """Hyperplane components precomputed ON THE DRIVER (deterministic
    sha256 of (table, plane, d), scaled to [-1, 1)) and shipped as one
    string literal per plane — Catalyst constant-folds the split/cast,
    so executors see a plain literal array, never a per-row hash."""
    import hashlib
    import struct

    rows = []
    for p in range(planes):
        comps = []
        for d in range(dim):
            h = hashlib.sha256(f"{table}:{p}:{d}".encode()).digest()
            comps.append(struct.unpack("<q", h[:8])[0] / 2.0 ** 63)
        try:
            rows.append(F.lit(comps))  # array literal (pyspark >= 4)
        except Exception:
            # CreateArray of literals constant-folds to one Literal
            rows.append(F.array(*[F.lit(c) for c in comps]))
    return rows


def _lsh_bits(vec, dim: int, planes: int, table: int) -> list:
    """sign bits of the projections onto `planes` fixed hyperplanes."""
    bits = []
    for plane in _plane_literal(dim, planes, table):
        proj = F.aggregate(F.zip_with(vec, plane, lambda x, h: x * h),
                           F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return bits


def _lsh_signature(vec, dim: int, planes: int, table: int):
    return F.concat(F.lit(f"{table}:"), *_lsh_bits(vec, dim, planes, table))


def _multiprobe_signatures(vec, dim: int, planes: int, table: int) -> list:
    """The exact signature plus every 1-bit-flipped variant
    (query-side multiprobe: a near neighbor that disagrees on one
    hyperplane still collides)."""
    bits = _lsh_bits(vec, dim, planes, table)
    flip = lambda b: F.when(b == "1", F.lit("0")).otherwise(F.lit("1"))
    probes = [F.concat(F.lit(f"{table}:"), *bits)]
    for i in range(planes):
        probe_bits = [flip(b) if j == i else b for j, b in enumerate(bits)]
        probes.append(F.concat(F.lit(f"{table}:"), *probe_bits))
    return probes


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame,
                    k: int = 5, planes: int = DEFAULT_LSH_PLANES,
                    tables: int = DEFAULT_TABLES,
                    dim: int | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k with multi-table OR-banding: `tables`
    independent sign-LSH tables of `planes` bits each; a candidate
    matches if it shares a bucket in ANY table (union + dedupe), which
    lifts recall without growing any single bucket — the scale answer
    to the single-band recall cliff. The bucket join carries only
    (id, bucket); vectors ride along per row but no N^2 pair ever
    materializes.

    Pass `dim` (embedding length) to keep plan construction
    action-free; if omitted, one metadata-light first() infers it."""
    if dim is None:
        dim = int(embeddings.select(
            F.size(F.col(vec_col)).alias("d")).first()["d"])
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select("q_id", F.col("q_vec").cast("array<double>"))
    e = e.withColumn("bucket", F.explode(F.array(*[
        _lsh_signature(F.col("v"), dim, planes, t) for t in range(tables)])))
    # corpus side: ONE bucket per table; query side (tiny, broadcast):
    # multiprobe — exact + 1-bit-flip probes per table
    probes = []
    for t in range(tables):
        probes.extend(_multiprobe_signatures(F.col("q_vec"), dim, planes, t))
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    joined = e.join(F.broadcast(q), "bucket") \
        .filter(F.col("nbr_id") != F.col("q_id")) \
        .dropDuplicates(["q_id", "nbr_id"])
    cos = _dot(F.col("v"), F.col("q_vec")) / \
        (_norm(F.col("v")) * _norm(F.col("q_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return joined.withColumn("cosine", cos) \
        .withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")
