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

from battetl_spark.analytics.textops import normalized_text


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) over normalized whitespace tokens — one explode and
    one partial-aggregated groupBy."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(text_col), " ")).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
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
    tf = term_frequencies(docs, id_col, text_col)
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
