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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PLANES = 8


def _cosine_udf():
    """Arrow-batched rowwise cosine: one numpy einsum per batch
    instead of ~3*dim interpreted Catalyst lambda evaluations per row
    (the HOF fold was the dominant scoring cost for both the exact
    scan and the LSH verify step)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if a.empty:
            return pd.Series([], dtype=np.float64)
        av = np.array(a.to_list(), dtype=np.float64)
        bv = np.array(b.to_list(), dtype=np.float64)
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        # zero-norm guard: numpy 0/0 is NaN and Spark orders NaN as the
        # LARGEST double, so an all-zero embedding would rank first in
        # every desc top-k window. Emit NULL instead (sorts last under
        # desc), matching what the old Catalyst division returned.
        ok = den > 0.0
        if ok.all():
            return pd.Series(num / den)
        vals = num / np.where(ok, den, 1.0)
        return pd.Series(
            [float(v) if o else None for v, o in zip(vals, ok)],
            dtype=object)

    return cos


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
    cos = _cosine_udf()(F.col("v"), F.col("q_vec"))
    scored = joined.withColumn("cosine", cos) \
        .filter(F.col("nbr_id") != F.col("q_id")) \
        .filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")


# sign-LSH match probability per table is (1 - theta/pi)^planes, so
# fewer bits per table = higher recall, more tables = OR-amplified
# recall, more bits = better bucket selectivity. The default (4 bits
# x 8 tables + query-directed multiprobe) holds recall ~1.0 even on
# the near-random bench embeddings (top-5 neighbors at theta~68deg,
# p_bit~0.62 — measured; at that angle NO bit budget prunes without
# losing recall, so the default buys recall and the structure). On a
# real clustered corpus (neighbors theta <= 45deg) raise `planes` to
# 8-16: candidate fraction drops ~2^-planes per probe while
# margin-directed probing keeps per-table capture high.
DEFAULT_LSH_PLANES = 4
DEFAULT_TABLES = 8


def _plane_matrix(dim: int, planes: int, tables: int):
    """All hyperplanes for all tables as ONE numpy matrix
    (tables*planes, dim), precomputed on the driver: deterministic
    sha256 of (table, plane, d) scaled to [-1, 1). ~16 KB at dim=64 —
    ships inside the UDF closure, no RNG state on executors."""
    import hashlib
    import struct

    mat = np.empty((tables * planes, dim), dtype=np.float64)
    for t in range(tables):
        for p in range(planes):
            for d in range(dim):
                h = hashlib.sha256(f"{t}:{p}:{d}".encode()).digest()
                mat[t * planes + p, d] = \
                    struct.unpack("<q", h[:8])[0] / 2.0 ** 63
    return mat


def _bucket_codes_udf(dim: int, planes: int, tables: int,
                      multiprobe: bool = False):
    """Arrow-vectorized signature computation: one pandas UDF doing a
    single (batch x dim) @ (dim x tables*planes) matrix multiply per
    Arrow batch, then bit-packing the signs into integer bucket codes
    `(table << planes) | bits` — replacing the former per-row chain of
    tables*planes interpreted F.aggregate/zip_with folds (measured
    7.2x the cost of the exact scan at sf0.1).

    multiprobe=True (query side) adds QUERY-DIRECTED probes per table
    (Lv et al., multi-probe LSH): the bits most likely to disagree
    with a near neighbor are those with the smallest projection
    margin |v . h|, so each table emits the exact code plus flips of
    subsets of its lowest-margin bits — far higher capture per probe
    than uniform 1-bit flips on weakly-clustered corpora."""
    from pyspark.sql.functions import pandas_udf

    mat_t = _plane_matrix(dim, planes, tables).T  # (dim, T*P)

    @pandas_udf("array<long>")
    def codes(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        v = np.array(vecs.to_list(), dtype=np.float64)  # (n, dim)
        packed = _batch_codes(v, mat_t, planes, tables, multiprobe)
        return pd.Series(list(packed))

    return codes


def _batch_codes(v, mat_t, planes: int, tables: int, multiprobe: bool):
    """numpy core shared by the UDF and the pruning evidence tests:
    (n, dim) -> (n, tables) codes, or (n, tables * n_probes) with
    query-directed multiprobe."""
    table_base = (np.arange(tables, dtype=np.int64) << planes)
    bit_weights = (1 << np.arange(planes, dtype=np.int64))
    proj = v @ mat_t  # (n, T*P)
    bits = proj >= 0.0
    packed = (bits.reshape(len(v), tables, planes)
              * bit_weights).sum(axis=2) + table_base  # (n, T)
    if multiprobe:
        # rank bits per table by |margin| ascending; probe all
        # subsets of the 3 smallest + pairs touching ranks 3-4:
        # <=12 probes/table
        margins = np.abs(proj).reshape(len(v), tables, planes)
        order = np.argsort(margins, axis=2)  # (n, T, P)
        n_ranks = min(5, planes)
        b = [(1 << order[:, :, i]).astype(np.int64)
             for i in range(n_ranks)]
        zero = np.zeros_like(b[0])
        mask_list = [zero, b[0]]
        if n_ranks > 1:
            mask_list += [b[1], b[0] | b[1]]
        if n_ranks > 2:
            mask_list += [b[2], b[0] | b[2], b[1] | b[2],
                          b[0] | b[1] | b[2]]
        if n_ranks > 3:
            mask_list += [b[3], b[0] | b[3]]
        if n_ranks > 4:
            mask_list += [b[4], b[0] | b[4]]
        masks = np.stack(mask_list, axis=-1)  # (n, T, <=12)
        packed = (packed[:, :, None] ^ masks).reshape(len(v), -1)
    return packed


def cosine_neardup_pairs(embeddings: DataFrame,
                         threshold: float = 0.3,
                         method: str = "exact",
                         planes: int = DEFAULT_LSH_PLANES,
                         tables: int = DEFAULT_TABLES,
                         dim: int | None = None,
                         max_bucket: int | None = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with
    a < b and cosine >= threshold.

    method='exact' — the all-pairs baseline (range self-join + one
    Arrow-batched numpy cosine per candidate batch). Exact and
    oracle-checkable (DuckDB list_cosine_similarity), but O(N^2)
    pairs: the correctness reference, not the 100 TB path.

    method='lsh' — the scale path: both sides hash through the same
    multi-table sign-LSH bucket codes as cosine_topk_lsh, candidates
    are bucket-cojoined carrying ONLY (id, bucket), deduped, then
    exact-cosine verified >= threshold. Pair count is bounded by
    bucket occupancy (plus the max_bucket hot-bucket cap, same knob
    as dedup.minhash_lsh_pairs) instead of N^2. Approximate by
    nature: recall vs the exact method is pinned in
    tests/test_training_ops.py on a clustered corpus."""
    e = embeddings.select(F.col(id_col).alias("a"),
                          F.col(vec_col).cast("array<double>").alias("va"))
    r = embeddings.select(F.col(id_col).alias("b"),
                          F.col(vec_col).cast("array<double>").alias("vb"))
    if method == "exact":
        cand = e.crossJoin(r).filter(F.col("a") < F.col("b"))
    elif method == "lsh":
        if dim is None:
            dim = int(embeddings.select(
                F.size(F.col(vec_col)).alias("d")).first()["d"])
        codes = _bucket_codes_udf(dim, planes, tables)
        buckets = embeddings.select(
            F.col(id_col).alias("id"),
            F.explode(codes(F.col(vec_col).cast("array<double>")))
            .alias("bucket"))
        if max_bucket is not None:
            sizes = buckets.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("__bn"))
            small = sizes.filter(F.col("__bn") <= max_bucket) \
                .drop("__bn")
            buckets = buckets.join(small, ["bucket"], "left_semi")
        ids = buckets.alias("l").join(
            buckets.alias("r"), "bucket") \
            .filter(F.col("l.id") < F.col("r.id")) \
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b")) \
            .dropDuplicates(["a", "b"])
        cand = ids.join(e, "a").join(r, "b")
    else:
        raise ValueError(f"unknown method {method!r}")
    cos = _cosine_udf()(F.col("va"), F.col("vb"))
    return cand.withColumn("cosine", cos) \
        .filter(F.col("cosine") >= threshold) \
        .select("a", "b", "cosine")


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
    materializes. Signatures are computed in one Arrow-batched matrix
    multiply per side (int bucket codes, cheaper to shuffle than
    strings).

    Pass `dim` (embedding length) to keep plan construction
    action-free; if omitted, one metadata-light first() infers it."""
    if dim is None:
        dim = int(embeddings.select(
            F.size(F.col(vec_col)).alias("d")).first()["d"])
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select("q_id", F.col("q_vec").cast("array<double>"))
    # corpus side: ONE bucket per table; query side (tiny, broadcast):
    # multiprobe — exact + 1-bit-flip probes per table
    corpus_codes = _bucket_codes_udf(dim, planes, tables)
    probe_codes = _bucket_codes_udf(dim, planes, tables, multiprobe=True)
    # the bucket join and dedup carry ONLY (q_id, nbr_id, bucket) —
    # never the dim-sized vectors (shuffling the arrays through the
    # dedup dominated the old plan); vectors rejoin on the deduped
    # candidate set for scoring
    e_buckets = e.select(
        "nbr_id", F.explode(corpus_codes(F.col("v"))).alias("bucket"))
    q_buckets = q.select(
        "q_id", F.explode(probe_codes(F.col("q_vec"))).alias("bucket"))
    cand = e_buckets.join(F.broadcast(q_buckets), "bucket") \
        .filter(F.col("nbr_id") != F.col("q_id")) \
        .select("q_id", "nbr_id").dropDuplicates(["q_id", "nbr_id"])
    scored = cand.join(e, "nbr_id") \
        .join(F.broadcast(q.select("q_id", "q_vec")), "q_id")
    cos = _cosine_udf()(F.col("v"), F.col("q_vec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return scored.withColumn("cosine", cos) \
        .filter(F.col("cosine").isNotNull()) \
        .withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")


# ----------------------------------------------------------------- IVF

def train_ivf_centroids(embeddings: DataFrame, n_cells: int,
                        sample_rows: int = 16384, iters: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained on a
    BOUNDED deterministic sample (the standard IVF recipe — e.g.
    FAISS trains its coarse quantizer on a sample, not the corpus):

    - sample = the `sample_rows` lowest xxhash64(id) rows. Spark
      executes orderBy+limit as TakeOrderedAndProject (per-partition
      top-n + driver merge), so the sample costs one corpus scan and
      O(sample) driver memory at any corpus size — no full sort.
    - Lloyd iterations run in numpy on the driver over the sample
      (n_cells x dim matrix out; microseconds at coarse-quantizer
      sizes). Initialization is the first n_cells DISTINCT
      hash-ordered rows — deterministic, no RNG state. Distinctness
      matters on replicated corpora: duplicate seed vectors would
      collapse two cells onto one centroid and argmax tie-breaking
      then starves the twin forever, silently shrinking the effective
      cell count. Cells that still come up empty are reseeded from
      the sample point farthest from its assigned centroid
      (deterministic; the standard empty-cluster repair).
    - rows and centroids are L2-normalized (spherical k-means), so
      nearest-centroid-by-dot-product == nearest by cosine.

    Returns (n_cells, dim) float64, rows L2-normalized."""
    rows = (embeddings
            .select(F.col(vec_col).cast("array<double>").alias("v"),
                    F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(sample_rows).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    if x.shape[0] < n_cells:
        raise ValueError(
            f"sample has {x.shape[0]} usable rows < n_cells={n_cells}")
    # first n_cells DISTINCT rows in hash order (see docstring)
    _, first_idx = np.unique(x.round(12), axis=0, return_index=True)
    uniq = x[np.sort(first_idx)]
    cent = (uniq if uniq.shape[0] >= n_cells else x)[:n_cells].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        # farthest-from-assigned-centroid points, for empty-cell reseed
        far_order = np.argsort(sims[np.arange(len(x)), assign],
                               kind="stable")
        fi = 0
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
            elif fi < len(far_order):
                cent[c] = x[far_order[fi]]
                fi += 1
    return cent


def _ivf_cells_udf(centroids: np.ndarray, nprobe: int = 1):
    """Arrow-batched cell assignment: one (batch x dim) @ (dim x k)
    matmul per batch, returning the `nprobe` nearest cell ids per
    row (nprobe=1 for the corpus side, >1 for query-side probing).
    The centroid matrix rides the UDF closure (a few hundred KB at
    coarse sizes) — the broadcast-dictionary pattern."""
    from pyspark.sql.functions import pandas_udf

    ct = centroids.T.copy()

    @pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        x = np.array(v.to_list(), dtype=np.float64)
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        sims = (x / n[:, None]) @ ct
        if nprobe == 1:
            top = np.argmax(sims, axis=1)[:, None]
        else:
            p = min(nprobe, sims.shape[1])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return cells


def cosine_topk_ivf(embeddings: DataFrame, queries: DataFrame,
                    k: int = 5, n_cells: int = 16, nprobe: int = 4,
                    centroids: np.ndarray | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: every corpus
    vector is assigned to its nearest coarse centroid; a query scores
    only vectors in its `nprobe` nearest cells.

    Spark-first shape: the corpus side is ONE scan + one Arrow matmul
    producing a cell id — it never shuffles. Queries (small side)
    explode to (q_id, cell) probe rows and BROADCAST-join the corpus
    on cell, so candidate selection is a map-side hash join; the only
    shuffle in the plan is the final per-query top-k window over
    candidates (~nprobe/n_cells of the corpus instead of all of it).
    At 100 TB: n_cells grows to ~sqrt(N) and the same plan holds —
    scan + broadcast probe + bounded window.

    recall/coverage contract vs brute force is pinned in
    tests/test_training_ops.py (clustered corpus)."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells,
                                        id_col=id_col, vec_col=vec_col)
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select("q_id", F.col("q_vec").cast("array<double>"))
    e_cells = e.withColumn(
        "cell", _ivf_cells_udf(centroids, 1)(F.col("v"))[0])
    q_probes = q.select(
        "q_id",
        F.explode(_ivf_cells_udf(centroids, nprobe)(F.col("q_vec")))
        .alias("cell"))
    cand = e_cells.join(F.broadcast(q_probes), "cell") \
        .filter(F.col("nbr_id") != F.col("q_id"))
    scored = cand.join(F.broadcast(q), "q_id")
    cos = _cosine_udf()(F.col("v"), F.col("q_vec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return scored.withColumn("cosine", cos) \
        .filter(F.col("cosine").isNotNull()) \
        .withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("q_id", "nbr_id", "cosine", "rank")
