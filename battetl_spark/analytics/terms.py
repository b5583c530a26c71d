"""Corpus term statistics: TF-IDF salient-term extraction.

A training-data pipeline profiles what its corpus is *about* — per-domain
topic drift, mixture debugging, keyword-based slice selection — and the
workhorse is TF-IDF over the whole corpus. Spark-first shape:

- one token explode + ``groupBy(doc, term)`` (partial-aggregated, so a
  stopword appearing 10^9 times combines map-side before the shuffle);
- document frequency from ONE more aggregate over the (doc, term) frame
  (its rows are already distinct pairs — never a count-distinct);
- the corpus size joins in as a broadcast one-row aggregate (no driver
  action, the function stays lazy/composable);
- per-document top-n by a window over ``doc_id`` — the honest cost of an
  exact per-doc ranking; partitioned by document so no key is hot.

Scoring uses the RATIONAL idf ``(N + 1) / (df + 1)`` by default: every
step is an IEEE-exact integer product (< 2^53) followed by one correctly-
rounded divide, so an external engine (the DuckDB oracle) reproduces the
scores — and therefore the ranking — bit-for-bit. ``idf="log"`` gives the
textbook ``ln((N+1)/(df+1)) + 1`` variant; libm ``log`` is not correctly
rounded, so that mode is NOT oracle-checked (documented, not a bug).

Reference analog: none (`/root/reference/battetl` has no corpus
analytics); LLM-pipeline layer per the build brief. Tokenization matches
``textops.normalized_text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from battetl_spark.analytics.cache import track as _track
from battetl_spark.analytics.textops import normalized_tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) over normalized whitespace tokens — one explode and
    one partial-aggregated groupBy."""
    toks = docs.select(
        F.col(id_col),
        F.explode(normalized_tokens(text_col)).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )


def frequent_ngrams(
    docs: DataFrame,
    n: int = 2,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level frequent word n-grams: every n-gram appearing in at
    least ``min_df`` distinct documents, with its document frequency and
    total occurrence count — the exact heavy-hitters pass a pipeline runs
    before boilerplate stripping or contamination review.

    Columns: ``ngram (string), df (long), occurrences (long)``. The output
    is a threshold SET (no top-k cut), so it is fully deterministic.

    Scale shape: n-grams come from n shifted ``slice`` views of ONE
    materialized token array zipped together (never indexing the outer
    array inside a lambda — that re-expands the normalization chain per
    element); then the tfidf aggregation ladder: groupBy(doc, ngram) with
    map-side partial aggregation absorbs within-doc repeats before the
    shuffle, and the corpus-level rollup counts the already-distinct pairs
    — never a count-distinct. A 10^9-doc corpus shuffles one row per
    distinct (doc, ngram), and the ``min_df`` filter runs post-aggregate
    where the data is smallest.

    Reference analog: none (no corpus analytics in the reference);
    LLM-pipeline layer per the build brief. Tokenization matches
    ``textops.normalized_text`` (empty text → one empty token; a doc with
    fewer than n tokens contributes no n-grams).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select(
        F.col(id_col), normalized_tokens(text_col).alias("__w")
    )
    if n == 1:
        grams = toks.select(id_col, F.explode("__w").alias("ngram"))
    else:
        sliced = toks.select(
            id_col,
            *[
                F.expr(
                    f"slice(__w, {i + 1}, greatest(size(__w) - {n - 1}, 0))"
                ).alias(f"__s{i}")
                for i in range(n)
            ],
        )
        zip_cols = ",".join(f"__s{i}" for i in range(n))
        parts = ",".join(f"s.__s{i}" for i in range(n))
        grams = sliced.select(
            id_col,
            F.explode(
                F.expr(f"transform(arrays_zip({zip_cols}), s -> concat_ws(' ', {parts}))")
            ).alias("ngram"),
        )
    per_doc = grams.groupBy(id_col, "ngram").agg(
        F.count(F.lit(1)).cast("long").alias("__occ")
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("__occ").cast("long").alias("occurrences"),
        )
        .filter(F.col("df") >= int(min_df))
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf: str = "ratio",
) -> DataFrame:
    """Top ``top_n`` TF-IDF terms per document.

    Columns: ``id, term, tf, rk, score`` (score rounded to 6 places for
    output; ranking uses the raw value, ties broken by ``term`` ascending
    — fully deterministic). ``idf="ratio"`` (default) scores
    ``tf * (N+1) / (df+1)`` (cross-engine bit-exact); ``idf="log"`` scores
    ``tf * (ln((N+1)/(df+1)) + 1)`` (textbook smoothing, same plan shape,
    not oracle-checkable because libm log is not correctly rounded).
    """
    if idf not in ("ratio", "log"):
        raise ValueError(f"idf must be 'ratio' or 'log', got {idf!r}")
    # persisted: the document-frequency aggregate AND the scoring join both
    # consume the (doc, term, tf) frame — unpersisted, the corpus-wide
    # explode+groupBy runs twice (measured 2× ~3.5 s at sf1)
    tf = _track(term_frequencies(docs, id_col, text_col))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = tf.join(dfreq, "term").join(F.broadcast(n_docs))
    ratio = (
        F.col("tf").cast("double")
        * (F.col("__n") + F.lit(1.0))
        / (F.col("__df") + F.lit(1.0))
    )
    if idf == "ratio":
        score = ratio
    else:
        idf_term = F.log((F.col("__n") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0)))
        score = F.col("tf").cast("double") * (idf_term + F.lit(1.0))
    win = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= int(top_n))
        .select(
            id_col,
            "term",
            "tf",
            F.col("rk").cast("int").alias("rk"),
            F.round(score, 6).alias("score"),
        )
    )
