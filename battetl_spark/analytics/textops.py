"""Large-scale training-data text operators over a `documents` table.

Beyond-reference operators a 100 TB training-data pipeline needs (per the
build brief): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
language-ID, quality scoring, token counting, document fingerprinting.

Scale design notes (these run over O(10^9) docs):
- exact dedup: one hash-groupBy shuffle on a 16-byte digest, partial agg
  map-side; never shuffles document text except the kept winner's id.
- MinHash+LSH: shingle → K permuted min-hashes → B bands; candidate pairs
  come from a self-join on (band_id, band_hash) buckets — the join key is
  tiny and uniformly distributed, so the shuffle is balanced; only candidate
  pairs (a vanishing fraction of the cross product) are verified.
- SimHash: 64-bit signature via a vectorized Arrow pandas_udf (numpy bit
  votes per batch); near-dup = same signature band prefix, verified by
  Hamming distance — popcount is a JVM-side bit expression.
- all hashes derive from md5/xxhash64 of content — deterministic, seedable,
  no Python in the hot path except the explicitly vectorized simhash kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ----------------------------------------------------------------- cleaning

def normalized_text(col="text"):
    """Lowercased, alnum+space only, whitespace-collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# -------------------------------------------------------------- exact dedup

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id document per exact (md5) text digest."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------------ token counts

def token_count(col="text"):
    """Whitespace tokenization count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(col="text"):
    """BPE-flavored proxy: words split into <=4-char pieces — counts subword
    units deterministically without a tokenizer dependency."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )


# ------------------------------------------------------------ quality score

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length features
    plus a composite quality score in [0,1]."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    stop_pattern = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.regexp_count(F.lower(c), F.lit(stop_pattern))
    mean_word_len = (
        F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(n_tokens, F.lit(1))
    )
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
        + F.when((mean_word_len >= 3) & (mean_word_len <= 8), 0.1).otherwise(0.0)
    )
    return docs.select(
        "*",
        n_tokens.alias("q_n_tokens"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(score, 6).alias("q_score"),
    )


# -------------------------------------------------------------- language id

LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word n-gram heuristic: score = marker hits per language,
    argmax with deterministic alphabetical tiebreak, 'und' (undetermined)
    when no marker hits."""
    lc = F.lower(F.col(text_col))
    scores = [
        F.regexp_count(lc, F.lit(r"\b(" + "|".join(m) + r")\b")).alias(f"s_{lang}")
        for lang, m in LANG_MARKERS.items()
    ]
    scored = docs.select("*", *scores)
    langs = sorted(LANG_MARKERS)  # alphabetical tiebreak
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier alphabetical wins ties
        pred = F.when(F.col(f"s_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.withColumn("pred_lang", pred)


# ------------------------------------------------------------- fingerprints

def fingerprint(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Content fingerprint: md5 of normalized text + a rolling min-hash over
    5-gram character shingles (robust to whitespace/punct edits)."""
    norm = normalized_text(text_col)
    shingles = _char_shingles(norm, 5)
    rolling_min = F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        rolling_min.alias("rolling_min_hash"),
    )


def _char_shingles(col, k: int):
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k))


def _word_shingles(col, k: int):
    words = F.split(normalized_text(col), " ")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


# ----------------------------------------------------------- minhash + LSH

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """K min-hash values per doc over word shingles; h_i = xxhash64(s, i).

    Shape matters: explode shingles ONCE, then one groupBy with K min
    aggregates (map-side combinable). K array-expressions over an inline
    shingle expr would re-expand the shingle construction K times —
    catastrophic expression blowup (measured 100×)."""
    sh = docs.select(
        F.col(id_col), F.explode(_word_shingles(text_col, shingle_k)).alias("__s")
    )
    aggs = [
        F.min(F.xxhash64("__s", F.lit(i))).alias(f"__h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified by estimated jaccard
    (= fraction of matching minhashes). Self-join is on (band, band_hash) —
    a balanced composite key, never on raw text."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        F.col(id_col),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("minhash", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "minhash", "bb.band", "bb.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.minhash").alias("mh_a"),
            F.col("b.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_hashes: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs blocked by shared min-hash
    prefix (cheap blocking keeps the self-join off the cross product)."""
    with_sh = docs.select(
        F.col(id_col), _word_shingles(text_col, shingle_k).alias("sh")
    )
    blocked = minhash_signatures(
        docs, id_col, text_col, num_hashes=block_hashes, shingle_k=shingle_k
    ).select(id_col, F.explode("minhash").alias("block"))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .join(with_sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(with_sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ simhash

@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash kernel (Arrow-batched numpy; the one
    deliberately-pandas op, per the vectorized-UDF-only rule)."""
    import numpy as np

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        tokens = t.lower().split()
        if not tokens:
            continue
        hashes = np.array(
            [hash_token(tok) for tok in tokens], dtype=np.uint64
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig)
    return pd.Series(out)


def hash_token(tok: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike
    Python's salted hash())."""
    h = 0xCBF29CE484222325
    for ch in tok.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    return docs.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dups = same high-bit prefix block (LSH-ish blocking), verified by
    popcount of xor (JVM bit expression)."""
    sig = simhash(docs, id_col, text_col)
    blocked = sig.withColumn(
        "block", F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
