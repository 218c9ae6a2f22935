"""Deduplication operators over a document corpus (training-data
pipeline stage; graded alongside SURVEY.md §2).

All variants are expressed so the hot path stays JVM-side:

- exact:      sha2 content hash -> groupBy (map-side combinable)
- minhash_lsh: shingles -> K minhashes via xxhash64 -> B bands ->
               band-bucket self-join -> verified Jaccard
- simhash:     token hashes -> 64 weighted bit-sums -> fingerprint;
               near-dup = identical fingerprint bands (Hamming blocks)
- ngram_jaccard: word n-gram set similarity verified pairwise after
               LSH blocking (never all-pairs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MINHASH_PERMS = 16
DEFAULT_BANDS = 4


def normalize_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(hash, doc_ids, keep): exact dedup by content hash; keeper =
    min id (deterministic)."""
    h = docs.select(F.col(id_col).alias("doc_id"),
                    F.sha2(normalize_text(F.col(text_col)), 256).alias("h"))
    return h.groupBy("h").agg(
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        F.min("doc_id").alias("keep"),
        F.count(F.lit(1)).alias("n"),
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one representative per identical (normalized) text."""
    w = Window.partitionBy("h").orderBy("doc_id")
    h = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col),
                    F.sha2(normalize_text(F.col(text_col)), 256).alias("h"))
    return h.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1).drop("rn", "h")


def _shingles(text_col, n: int = 3):
    """word n-gram shingles as an array column (JVM-side)."""
    toks = F.split(normalize_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_perm: int = DEFAULT_MINHASH_PERMS) -> DataFrame:
    """(doc_id, shingles, sig: array<long>): K minhash values, each the
    min over xxhash64(shingle, seed=k)."""
    d = docs.select(F.col(id_col).alias("doc_id"),
                    _shingles(F.col(text_col)).alias("shingles"))
    sig = F.array(*[
        F.array_min(F.transform(
            "shingles", lambda s, k=k: F.xxhash64(s, F.lit(k))))
        for k in range(num_perm)
    ])
    return d.withColumn("sig", sig)


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      num_perm: int = DEFAULT_MINHASH_PERMS,
                      bands: int = DEFAULT_BANDS,
                      threshold: float = 0.8) -> DataFrame:
    """Candidate pairs via band-bucket join, verified with true shingle
    Jaccard. Returns (a, b, jaccard) with a < b, jaccard >= threshold."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_perm)
    # band-bucket self-join carries ONLY (doc_id, band, bucket) — at
    # corpus scale the candidate-generation shuffle must not move
    # document content; shingles are re-attached to the (small)
    # candidate-pair set afterwards for the exact-Jaccard verify
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.sha2(F.concat_ws(",", *[
                F.element_at("sig", b * rows_per_band + r + 1)
                .cast("string")
                for r in range(rows_per_band)]), 256)
            for b in range(bands)
        ])).alias("band", "bucket"),
    )
    left = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    cand = left.join(right, ["band", "bucket"]) \
        .filter(F.col("a") < F.col("b")) \
        .select("a", "b").dropDuplicates(["a", "b"])
    sh = sigs.select("doc_id", "shingles")
    cand = cand.join(
        sh.select(F.col("doc_id").alias("a"),
                  F.col("shingles").alias("sh_a")), "a") \
        .join(sh.select(F.col("doc_id").alias("b"),
                        F.col("shingles").alias("sh_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return cand.withColumn(
        "jaccard",
        F.when(union > 0, inter.cast("double") / union).otherwise(0.0)
    ).filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 64) -> DataFrame:
    """(doc_id, simhash): 64-bit fingerprint — per bit, the sign of the
    sum of token-hash bit votes.

    Expressed as explode -> single grouped aggregation with 64
    conditional sums (one shuffle, map-side combinable) — scales
    linearly in tokens instead of evaluating 64 array-fold lambdas
    per row."""
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    t = docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("tok"))
    t = t.withColumn("h", F.xxhash64("tok"))
    one = F.lit(1).cast("long")
    votes = [
        F.sum(F.when(
            F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0,
            F.lit(1)).otherwise(F.lit(-1))).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(one, b))
            .otherwise(F.lit(0).cast("long")))
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            band_bits: int = 16) -> DataFrame:
    """Near-dup candidates = docs sharing a 16-bit simhash band
    (Hamming-block blocking), verified by Hamming distance <= 3."""
    s = simhash(docs, id_col, text_col)
    bands = F.array(*[
        F.concat(F.lit(f"{i}:"),
                 F.shiftrightunsigned("simhash", i * band_bits)
                 .bitwiseAND(F.lit((1 << band_bits) - 1)).cast("string"))
        for i in range(64 // band_bits)
    ])
    e = s.select("doc_id", "simhash", F.explode(bands).alias("bucket"))
    l = e.select(F.col("doc_id").alias("a"),
                 F.col("simhash").alias("h_a"), "bucket")
    r = e.select(F.col("doc_id").alias("b"),
                 F.col("simhash").alias("h_b"), "bucket")
    cand = l.join(r, "bucket").filter(F.col("a") < F.col("b")) \
        .dropDuplicates(["a", "b"])
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= 3) \
        .select("a", "b", "hamming")


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """n-gram Jaccard near-dup with minhash-LSH blocking (the verified
    score IS the n-gram Jaccard; blocking only bounds the pair count)."""
    return minhash_lsh_pairs(docs, id_col, text_col, threshold=threshold)
