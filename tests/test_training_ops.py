"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from gpml2pvjson_js_spark.operators.dedup import (
    dedup_exact, exact_duplicates, minhash_lsh_pairs,
    minhash_signatures, simhash, simhash_near_duplicates)
from gpml2pvjson_js_spark.operators.multimodal import (
    FEATURE_DIM, MEDIA_SCHEMA, extract_features, frame_sample_plan,
    synthesize_media)
from gpml2pvjson_js_spark.operators.similarity import (
    cosine_topk_bruteforce, cosine_topk_ivf, cosine_topk_lsh,
    train_ivf_centroids)
from gpml2pvjson_js_spark.operators.text_analysis import (
    language_id, quality_score, token_counts)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "The  Quick Brown Fox jumps over the lazy dog", "en"),  # exact dup (normalized)
        (3, "the quick brown fox jumps over the lazy cat", "en"),   # near dup
        (4, "der hund ist nicht ein fisch und das ist gut", "de"),
        (5, "completely different text about spark pipelines here", "en"),
        (6, "le chat est une petite bete pour la maison", "fr"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    groups = exact_duplicates(docs)
    dup = groups.filter(F.col("n") > 1).collect()
    assert len(dup) == 1 and dup[0]["doc_ids"] == [1, 2]
    kept = dedup_exact(docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 2).count() == 0


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["a"], r["b"]) for r in
             minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup found
    assert all(a < b for a, b in pairs)
    assert (4, 5) not in pairs


def test_minhash_lsh_equals_bruteforce_oracle(spark):
    """LSH pair set == brute-force all-pairs shingle Jaccard >= 0.8
    (DuckDB) on the sf0.001 documents table — the recall contract.
    Also guards the transform-lambda seed bug: a 2-arg lambda receives
    the array INDEX, not the closure value, making every perm
    identical position-dependent garbage."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    srows = sorted(
        tuple(r) for r in entry.queries()["minhash_lsh_pairs"](spark, sf)
        .select("a", "b", "jaccard").collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
    orows = sorted(
        tuple(r)
        for r in con.sql(entry.oracle_sql()["minhash_lsh_pairs"]).fetchall())
    assert srows == orows
    assert len(srows) > 0


def test_minhash_perm_seeds_are_distinct(spark):
    """Each of the 16 minhash perms must use a distinct seed: for a
    multi-shingle doc the 16 signature values should not all collide
    (they did when the seed was silently replaced by the array
    index)."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and "
             "again and once more for good measure", "en")],
        "doc_id long, text string, lang string")
    sig = minhash_signatures(docs).collect()[0]["sig"]
    assert len(set(sig)) > 8


def test_simhash_near_duplicates(docs):
    s = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert s[1] == s[2]  # identical normalized text
    pairs = {(r["a"], r["b"]) for r in
             simhash_near_duplicates(docs).collect()}
    assert (1, 2) in pairs


def test_ann_bruteforce_and_lsh(spark):
    import math
    vecs = [(i, [math.cos(i / 7.0 + d) for d in range(8)], 0)
            for i in range(50)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    assert len(exact) == 5
    assert exact[0]["rank"] == 1
    cos = [r["cosine"] for r in sorted(exact, key=lambda r: r["rank"])]
    assert cos == sorted(cos, reverse=True)
    # LSH returns a subset ranked consistently
    approx = cosine_topk_lsh(emb, q, k=5).collect()
    assert 0 < len(approx) <= 5
    exact_ids = {r["nbr_id"] for r in exact}
    approx_ids = {r["nbr_id"] for r in approx}
    recall = len(approx_ids & exact_ids) / len(exact_ids)
    assert recall >= 0.9, f"LSH top-k recall {recall} < 0.9"


def test_ann_lsh_recall_on_testdata(spark):
    """Recall >= 0.9 vs brute force on the real sf0.001 embeddings
    table (64-dim, 8 queries) — pins the multiprobe + multi-table
    recall claim on representative data, not just the toy ring."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cols = emb.columns
    id_col = "vec_id" if "vec_id" in cols else cols[0]
    vec_col = "embedding" if "embedding" in cols else cols[1]
    q = emb.limit(8).select(F.col(id_col).alias("q_id"),
                            F.col(vec_col).alias("q_vec"))
    exact = cosine_topk_bruteforce(emb, q, k=5, id_col=id_col,
                                   vec_col=vec_col).collect()
    approx = cosine_topk_lsh(emb, q, k=5, dim=64, id_col=id_col,
                             vec_col=vec_col).collect()
    by_q_exact, by_q_approx = {}, {}
    for r in exact:
        by_q_exact.setdefault(r["q_id"], set()).add(r["nbr_id"])
    for r in approx:
        by_q_approx.setdefault(r["q_id"], set()).add(r["nbr_id"])
    hits = sum(len(by_q_exact[qid] & by_q_approx.get(qid, set()))
               for qid in by_q_exact)
    total = sum(len(s) for s in by_q_exact.values())
    assert hits / total >= 0.9, f"corpus LSH recall {hits/total} < 0.9"


def test_hot_bucket_cap_and_doc_ids_cap(spark):
    """Scale guards: max_bucket drops a boilerplate-heavy bucket from
    the band self-join; exact_duplicates caps the doc_ids array while
    n keeps the true count."""
    rows = [(i, "exactly the same boilerplate text repeated here",
             "en") for i in range(20)]
    rows += [(100, "a unique document about salted joins", "en"),
             (101, "a unique document about salted joins", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # uncapped: the 20-dup cluster produces pairs; capped at 5: gone,
    # small cluster survives
    capped = minhash_lsh_pairs(docs, threshold=0.8, max_bucket=5).collect()
    pairs = {(r["a"], r["b"]) for r in capped}
    assert (100, 101) in pairs
    assert not any(a < 20 and b < 20 for a, b in pairs)
    dup = exact_duplicates(docs, max_ids=5).filter(F.col("n") == 20).collect()
    assert len(dup) == 1
    # a >max_ids group gets at most max_ids deterministic
    # representatives (min per salt sub-group), always incl. the keeper
    assert 1 <= len(dup[0]["doc_ids"]) <= 5
    assert dup[0]["keep"] == 0 and 0 in dup[0]["doc_ids"]


def test_exact_duplicates_degenerate_group_bounded(spark):
    """One hash x 50k rows: the aggregation buffer is bounded — small
    groups collect exact membership only after an n<=max_ids
    pre-filter, and the degenerate group goes through the salted
    min-per-sub-group path whose second-level collect sees at most
    max_ids rows (no unbounded collect_list over the full group)."""
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same text in every row").alias("text"))
    out = exact_duplicates(docs, max_ids=100).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n"] == 50_000 and row["keep"] == 0
    assert 1 <= len(row["doc_ids"]) <= 100
    assert 0 in row["doc_ids"]
    assert row["doc_ids"] == sorted(row["doc_ids"])


def test_ngram_jaccard_threads_n(spark):
    """ngram_jaccard_pairs(n=...) must actually change the shingle
    size: the crafted pair is a near-dup at n=2 (j=0.636) but not at
    n=3 (j=0.454), so threshold 0.5 separates the two settings."""
    from gpml2pvjson_js_spark.operators.dedup import ngram_jaccard_pairs
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    b = a.replace("w5", "x5")
    docs = spark.createDataFrame([(1, a), (2, b)],
                                 "doc_id long, text string")
    p2 = {(r["a"], r["b"]) for r in
          ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()}
    p3 = {(r["a"], r["b"]) for r in
          ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert (1, 2) in p2
    assert (1, 2) not in p3


def test_shingle_edge_whitespace_and_empty_docs(spark):
    """Collapse-then-strip normalization: a doc with leading tabs /
    trailing newlines shingles identically to its clean twin (exact
    near-dup, j=1.0); empty / whitespace-only / null docs emit [] and
    produce no pairs at all."""
    docs = spark.createDataFrame(
        [(1, "foo bar baz quux alpha"),
         (2, "\tfoo  bar baz\nquux alpha\r\n"),
         (3, ""), (4, "   \t\n "), (5, None)],
        "doc_id long, text string")
    sigs = {r["doc_id"]: r for r in minhash_signatures(docs).collect()}
    assert sigs[1]["shingles"] == sigs[2]["shingles"]
    assert sigs[3]["shingles"] == [] and sigs[4]["shingles"] == []
    assert sigs[3]["sig"] is None and sigs[4]["sig"] is None
    pairs = minhash_lsh_pairs(docs, threshold=0.8).collect()
    assert {(r["a"], r["b"], r["jaccard"]) for r in pairs} \
        == {(1, 2, 1.0)}


def test_simhash_portable_hash_matches_duckdb_bruteforce(spark):
    """The banded simhash pair set (portable 60-bit md5 token hash)
    EQUALS DuckDB's brute-force all-pairs Hamming<=3 on the sf0.001
    documents — the oracle now wired into CORRECTNESS as
    simhash_neardup."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {(r["a"], r["b"], r["hamming"]) for r in
           entry.q_simhash_neardup(spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = {(a, b, h) for a, b, h in
            con.execute(entry.oracle_sql()["simhash_neardup"]).fetchall()}
    assert got == want


def test_cosine_zero_norm_vector_never_ranks(spark):
    """A zero embedding must not become a false top-1 neighbor: the
    cosine UDF emits NULL for zero-norm rows (NaN would sort FIRST
    under desc in Spark) and both top-k paths filter nulls."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.8, 0.2, 0.0, 0.0]), (3, [0.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = cosine_topk_bruteforce(emb, q, k=3).collect()
    ids = [r["nbr_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 3 not in ids
    assert ids == [1, 2]
    assert all(r["cosine"] is not None for r in out)


def test_lsh_small_plane_counts_no_crash(spark):
    """cosine_topk_lsh with planes=1 and planes=2 (public parameters)
    must not IndexError inside the multiprobe mask builder."""
    rows = [(i, [float(i % 3), 1.0, float(i), 0.5]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    for planes in (1, 2):
        out = cosine_topk_lsh(emb, q, k=3, planes=planes, tables=2,
                              dim=4)
        assert out.count() > 0


def test_lsh_prunes_clustered_corpus():
    """Scale-path evidence, pure numpy (no Spark): the bench
    embeddings are near-random (top-5 neighbors at theta~68deg) so no
    bit budget prunes them, but on a CLUSTERED corpus — the case LSH
    exists for — 8-bit tables + margin-directed multiprobe keep
    recall >= 0.9 while candidate volume stays a small fraction of
    the brute-force n*q pair count."""
    import numpy as np

    from gpml2pvjson_js_spark.operators.similarity import (
        _batch_codes, _plane_matrix)

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 32, 80, 60  # 4800 vectors
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = np.repeat(centers, per, axis=0) \
        + rng.normal(size=(n_clusters * per, dim)) * 0.15
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    planes, tables = 10, 8
    mat_t = _plane_matrix(dim, planes, tables).T
    corpus_codes = _batch_codes(v, mat_t, planes, tables, False)
    qidx = np.arange(10) * per
    probe_codes = _batch_codes(v[qidx], mat_t, planes, tables, True)

    sims = v[qidx] @ v.T
    for row, qi in enumerate(qidx):
        sims[row, qi] = -2.0
    exact_top5 = np.argsort(-sims, axis=1)[:, :5]

    total_candidates = hits = 0
    for row in range(len(qidx)):
        probes = set(probe_codes[row].tolist())
        cand = {i for i in range(len(v))
                if i != qidx[row]
                and probes.intersection(corpus_codes[i].tolist())}
        total_candidates += len(cand)
        hits += len(cand.intersection(exact_top5[row].tolist()))
    recall = hits / exact_top5.size
    cand_fraction = total_candidates / (len(qidx) * len(v))
    assert recall >= 0.9, f"clustered recall {recall}"
    assert cand_fraction <= 0.2, \
        f"candidate fraction {cand_fraction} — no pruning"


def test_cosine_neardup_exact_matches_duckdb(spark):
    """Exact embedding-cosine near-dup pairs == DuckDB brute-force
    all-pairs list_cosine_similarity >= 0.3 at sf0.001 (the same
    contract the driver's oracle checks at sf0.01)."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {(r["a"], r["b"], r["cosine"]) for r in
           entry.queries()["cosine_neardup"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = set(map(tuple,
                   con.execute(entry.oracle_sql()["cosine_neardup"])
                   .fetchall()))
    assert got == want and len(got) > 0


def test_cosine_neardup_lsh_recall(spark):
    """The LSH-blocked scale path finds every planted near-dup pair
    (cosine >= 0.95 at theta~8deg: per 4-bit table p~0.83, 8 tables
    OR-amplified ~1.0) while generating fewer candidate pairs than
    all-pairs — the shape that survives 100 TB."""
    import numpy as np

    from gpml2pvjson_js_spark.operators.similarity import (
        cosine_neardup_pairs)

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        if i % 3 == 0:  # plant a near-dup twin
            w = v + rng.normal(size=16) * 0.02
            rows.append((2 * i + 1, [float(x) for x in w]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    exact = {(r["a"], r["b"]) for r in cosine_neardup_pairs(
        emb, threshold=0.95, method="exact").collect()}
    lsh = {(r["a"], r["b"]) for r in cosine_neardup_pairs(
        emb, threshold=0.95, method="lsh", dim=16).collect()}
    assert len(exact) == 40  # one pair per planted twin
    assert lsh == exact


def test_language_id(docs):
    pred = {r["doc_id"]: r["lang_pred"]
            for r in language_id(docs).collect()}
    assert pred[1] == "en"
    assert pred[4] == "de"
    assert pred[6] == "fr"


def test_quality_and_tokens(docs):
    q = quality_score(docs).filter(F.col("doc_id") == 1).collect()[0]
    assert q["n_tokens"] == 9
    assert 0 <= q["quality"] <= 1
    t = token_counts(docs).filter(F.col("doc_id") == 1).collect()[0]
    assert t["ws_tokens"] == 9
    assert t["bpe_tokens_est"] >= 9


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, 12)
    assert media.count() == 12
    f = extract_features(media)
    rows = f.collect()
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    # PNG and WAV payloads are REALLY decoded (stdlib inflate / PCM
    # parse): dims/duration come from the payload bytes, not metadata
    for r in by_kind["image"]:
        i = r["media_id"]
        assert r["decode_status"] == "ok"
        assert r["width"] == 32 + (i % 3) * 16
        assert r["height"] == 24 + (i % 2) * 8
    for r in by_kind["audio"]:
        assert r["decode_status"] == "ok"
        assert r["duration_ms"] == 250 * (1 + r["media_id"] % 4)
    # Y4M video payloads are REALLY decoded too: dims and duration
    # come from the header + FRAME walk, not the metadata columns
    for r in by_kind["video"]:
        assert r["decode_status"] == "ok"
        assert r["width"] == 64 and r["height"] == 64
        assert r["duration_ms"] == 1000 * (1 + r["media_id"] % 2)
    # deterministic across runs
    again = extract_features(synthesize_media(spark, 12)).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    plan = frame_sample_plan(media, every_ms=500)
    expect = sum(1 + r["duration_ms"] // 500
                 for r in media.filter(F.col("kind") == "video")
                 .select("media_id", "duration_ms").collect())
    assert plan.count() == expect


def test_y4m_roundtrip_and_frame_sampling(spark):
    """Video decode is real: the Y4M header/FRAME walk recovers dims,
    frame count, and duration from the BYTES, and sample_frames emits
    the actual decoded luma planes at the planned timestamps."""
    from gpml2pvjson_js_spark.operators.multimodal import (
        _decode_y4m, _y4m_bytes, sample_frames, synthesize_media)
    import numpy as np

    b = _y4m_bytes(32, 16, 5, "t", fps=5)
    w, h, n, dur, lumas = _decode_y4m(b)
    assert (w, h, n, dur) == (32, 16, 5, 1000)
    assert lumas.shape == (5, 32 * 16)
    # deterministic synthesis
    assert _y4m_bytes(32, 16, 5, "t", fps=5) == b
    # truncated stream raises (quarantined upstream, never silent)
    import pytest as _pt
    with _pt.raises(ValueError):
        _decode_y4m(b[:-10])
    with _pt.raises(ValueError):
        _decode_y4m(b"YUV4MPEG2 W32 H16\nFRAME\n")  # no F, short

    media = synthesize_media(spark, 12)
    frames = sample_frames(media, every_ms=500).collect()
    vids = {r["media_id"]: r for r in
            media.filter("kind = 'video'").collect()}
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rs in by_vid.items():
        assert len(rs) == 1 + vids[mid]["duration_ms"] // 500
        assert all(r["width"] == 64 and r["height"] == 64 for r in rs)
        # frame indices are monotone with timestamp and in range
        idxs = [r["frame_idx"] for r in sorted(
            rs, key=lambda r: r["frame_ts_ms"])]
        assert idxs == sorted(idxs) and idxs[0] == 0
        assert all(0 <= np.float32(r["luma_mean"]) <= 1 for r in rs)


def test_resize_images_real_png_roundtrip(spark):
    """Resize decodes the PNG, nearest-neighbor samples the grid, and
    re-encodes a PNG that our own decoder (and any PNG reader) can
    parse at the new dimensions."""
    from gpml2pvjson_js_spark.operators.multimodal import (
        _decode_png, resize_images, synthesize_media)

    media = synthesize_media(spark, 12)
    out = resize_images(media, 16, 12).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images and n_images > 0
    for r in out:
        assert r["resize_status"] == "ok"
        w, h, px = _decode_png(bytes(r["payload"]))
        assert (w, h) == (16, 12)
        assert len(px) == 16 * 12


def test_multimodal_malformed_payload_quarantines(spark):
    """A corrupt payload must yield an error row, never a task crash."""
    import pandas as pd
    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [0], "kind": ["image"],
            "payload": [b"not a png at all"], "mime": ["image/png"],
            "width": pd.array([None], dtype="Int32"),
            "height": pd.array([None], dtype="Int32"),
            "duration_ms": pd.array([None], dtype="Int32"),
        }), schema=MEDIA_SCHEMA)
    r = extract_features(media).collect()[0]
    assert r["decode_status"].startswith("error:")
    assert r["feature"] == [0.0] * FEATURE_DIM


def test_ivf_init_dedups_replicated_corpus(spark):
    """On a replicated corpus (duplicate vectors adjacent in hash
    order) the k-means init must seed from DISTINCT rows: duplicate
    seeds collapse two cells onto one centroid and argmax tie-breaking
    starves the twin forever, silently shrinking the effective cell
    count."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 12))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i % 8].tolist()) for i in range(400)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    cent = train_ivf_centroids(emb, 8, sample_rows=400, iters=2)
    assert len(np.unique(cent.round(9), axis=0)) == 8


def test_ann_ivf_recall_clustered(spark):
    """IVF scale path: on a clustered corpus (the case IVF exists
    for), nprobe=4 of 16 cells keeps top-5 recall >= 0.9 vs brute
    force while scoring only a fraction of the corpus; the coarse
    quantizer is deterministic (same centroids across two trainings).
    """
    import numpy as np

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 16, 16, 40
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = np.repeat(centers, per, axis=0) \
        + rng.normal(size=(n_clusters * per, dim)) * 0.15
    rows = [(i, v[i].tolist()) for i in range(len(v))]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") % 40 == 0).limit(6).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"))

    cent1 = train_ivf_centroids(emb, 16, sample_rows=640)
    cent2 = train_ivf_centroids(emb, 16, sample_rows=640)
    assert np.array_equal(cent1, cent2)  # deterministic training

    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = cosine_topk_ivf(emb, q, k=5, n_cells=16, nprobe=4,
                             centroids=cent1).collect()
    by_q_exact, by_q_approx = {}, {}
    for r in exact:
        by_q_exact.setdefault(r["q_id"], set()).add(r["nbr_id"])
    for r in approx:
        by_q_approx.setdefault(r["q_id"], set()).add(r["nbr_id"])
    hits = sum(len(by_q_exact[qid] & by_q_approx.get(qid, set()))
               for qid in by_q_exact)
    total = sum(len(s) for s in by_q_exact.values())
    assert hits / total >= 0.9, f"IVF recall {hits/total} < 0.9"
