"""Text analysis operators for the training-data pipeline: language
ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (JVM-side),
each designed to be SQL-expressible so DuckDB oracles can replicate
them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists (heuristic language ID)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para"],
}


def _tokens(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def _stopword_hits(toks, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(toks), arr))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the language whose stopword list has the most distinct
    hits; ties broken by language code order; no hits -> 'und'."""
    toks = _tokens(F.col(text_col))
    df = docs.withColumn("_toks", toks)
    hit_cols = {f"_h_{lang}": _stopword_hits(F.col("_toks"), words)
                for lang, words in LANG_STOPWORDS.items()}
    df = df.withColumns(hit_cols)
    best = None
    for lang in sorted(LANG_STOPWORDS):
        c = F.col(f"_h_{lang}")
        if best is None:
            best = F.struct(c.alias("hits"), F.lit(lang).alias("lang"))
        else:
            cand = F.struct(c.alias("hits"), F.lit(lang).alias("lang"))
            best = F.when(cand.hits > best.hits, cand).otherwise(best)
    df = df.withColumn(
        "lang_pred",
        F.when(best.hits > 0, best.lang).otherwise(F.lit("und")))
    return df.drop("_toks", *hit_cols.keys())


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features and
    a composite score in [0, 1] (Gopher/C4-style heuristics)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = _tokens(text)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens) \
        .otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars) \
        .otherwise(F.lit(0.0))
    stop_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens) \
        .otherwise(F.lit(0.0))
    len_ok = (n_tokens >= 5) & (n_tokens <= 100000)
    tok_len_ok = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    punct_ok = punct_ratio <= 0.2
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(tok_len_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ok, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2, F.lit(0.1))
    )
    return docs.withColumns({
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality": score,
    })


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy count
    (word-piece estimate: ceil(chars-per-word / 4) summed)."""
    text = F.col(text_col)
    toks = _tokens(text)
    ws = F.size(toks)
    bpe = F.aggregate(
        toks, F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int"))
    return docs.withColumns({
        "ws_tokens": ws,
        "bpe_tokens_est": bpe,
    })


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: sha256 of normalized text
    plus a 64-bit rolling-style hash (xxhash64)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.withColumns({
        "fp_sha256": F.sha2(norm, 256),
        "fp_xx64": F.xxhash64(norm),
    })
