"""Exact substring (k-token span) deduplication.

Doc-level near-dup (minhash/simhash/ngram — ``textops.py``) misses the
dominant real-world contamination mode: two mostly-different documents
sharing one long verbatim passage (boilerplate, licenses, quoted news
wire). The public "Deduplicating Training Data Makes Language Models
Better" recipe (Lee et al., 2022) dedups at SPAN granularity instead:
find every k-token window that occurs in more than one document and strip
the duplicated passages, keeping the unique remainder of each document.

Spark-first shape (no suffix array — that is the single-node design):

- every document emits its rolling k-token spans as ``xxhash64 over the word-hash window``
  with the 1-based start position (``span_occurrences``) — one explode,
  O(total tokens) rows, embarrassingly parallel;
- one ``groupBy(span_h)`` (partial-aggregated ``min(doc)!=max(doc)``
  — never a count-distinct expansion) finds spans seen in ≥2 distinct
  documents (``cross_doc_dup_spans``);
- a join back on ``span_h`` marks duplicated occurrences, and ONE
  ``groupBy(doc_id)`` folds them into per-document stats
  (``span_dedup_stats``) or a cleaned text with the covered tokens
  removed (``strip_duplicated_spans``). Span→doc coverage (union of
  overlapping [pos, pos+k-1] windows) is an in-row ``F.aggregate`` fold
  over the sorted start positions — no second window Exchange.

Total cost: 3 shuffles of span-sized data (hash agg, mark join, doc
fold), each map-side combinable; nothing is all-pairs and nothing grows
faster than the corpus token count, so the plan survives 100 TB.

Span keys are 64-bit xxhash64 values over the PER-WORD hash array
(round 6): the operators and oracles only ever compare span keys for
equality, and two spans are equal iff their word tuples are equal — true
for md5(concat_ws(words)) and for xxhash64(word-hashes) alike (modulo
64-bit collisions, verified against the md5-keyed DuckDB oracles at
sf0.001/0.01/0.1). The long keys shuffle 8 bytes instead of a 32-char
string, hash-aggregate on primitive longs, and skip the per-span string
concat + MD5 digest + hex encode entirely. The word-hash array is
materialized as a COLUMN before the shifted slices are built — leaving
the split/regexp chain inline re-evaluates it once per slice argument
inside the (non-codegen, no-CSE) Generate node: 16 chain evaluations per
row at k=8, the dominant cost of the round-5 shape.

Reference analog: none — the reference ETL (`/root/reference/battetl`)
has no corpus analytics; this belongs to the engine's LLM-pipeline layer
(build brief). Tokenization matches ``textops.normalized_text`` so span
results compose with the other dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from battetl_spark.analytics.cache import track as _track
from battetl_spark.analytics.textops import normalized_tokens


def _span_hash_seq(wh_col, k: int):
    """Rolling k-token span hash sequence from a MATERIALIZED word-hash
    array attribute, in document order. Built from k shifted ``F.slice``
    views zipped per row — NEVER by indexing an outer array expression
    inside a lambda (re-evaluates the whole chain per element; see the
    textops shingle core) — and ``wh_col`` must be a plain column
    reference, or each slice argument re-evaluates the split+hash chain
    per ROW inside the Generate node (no codegen CSE there; 16× at k=8,
    measured dominant). ``arrays_zip`` pads the trailing windows with NULL
    and ``xxhash64`` skips NULL args, so a doc shorter than k tokens
    yields exactly one partial span — mirroring the oracle's clamped list
    slice + concat_ws NULL skip."""
    n = F.greatest(F.size(wh_col) - (k - 1), F.lit(1))
    shifted = [F.slice(wh_col, j + 1, n) for j in range(k)]
    return F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.xxhash64(*[s[str(j)] for j in range(k)]),
    )


def span_occurrences(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (document, rolling k-token span occurrence):
    ``(id, n_toks, pos, span_h)`` with ``pos`` 1-based. A doc with
    ``n_toks >= k`` emits ``n_toks - k + 1`` spans; shorter docs emit one
    partial span at pos 1 (so every doc is represented). ``span_h`` is the
    64-bit span key (equality-isomorphic to the span text, see module
    docstring)."""
    words = normalized_tokens(text_col)
    staged = docs.select(
        F.col(id_col),
        F.transform(words, lambda w: F.xxhash64(w)).alias("__wh"),
    )
    return staged.select(
        F.col(id_col),
        F.size("__wh").alias("n_toks"),
        F.posexplode(_span_hash_seq(F.col("__wh"), k)).alias("pos", "span_h"),
    ).withColumn("pos", F.col("pos") + 1)


def cross_doc_dup_spans(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Span hashes occurring in >= 2 DISTINCT documents. One partial-
    aggregated groupBy — ``min(id) != max(id)`` instead of count-distinct,
    so the map side combines to two ids per span regardless of how hot the
    span is (a corpus-wide boilerplate span never skews a partition)."""
    return (
        spans.groupBy("span_h")
        .agg((F.min(id_col) != F.max(id_col)).alias("__x"))
        .filter("__x")
        .select("span_h")
    )


def _marked(docs, k, id_col, text_col):
    """Span occurrences left-marked with their cross-doc-duplicate flag.
    The spans frame is persisted: the dup-hash aggregate and the mark join
    both consume it, and without the persist each side would re-tokenize
    the corpus."""
    spans = _track(span_occurrences(docs, k, id_col, text_col))
    dup = cross_doc_dup_spans(spans, id_col).withColumn("__dup", F.lit(True))
    return spans.join(dup, "span_h", "left").withColumn(
        "__dup", F.coalesce("__dup", F.lit(False))
    )


def _covered_tokens(ps_col, n_toks_col, k: int):
    """Union length of the [p, min(p+k-1, n_toks)] windows for sorted start
    positions ``ps_col`` — an in-row fold (classic interval merge carried as
    (covered, prev_end)), no window Exchange."""
    end = lambda p: F.least(p + F.lit(k - 1), n_toks_col)  # noqa: E731
    acc0 = F.struct(
        F.lit(0).cast("int").alias("cov"), F.lit(0).cast("int").alias("prev")
    )
    step = lambda a, p: F.struct(  # noqa: E731
        (
            a["cov"]
            + F.greatest(F.lit(0), end(p) - F.greatest(a["prev"], p - 1))
        ).alias("cov"),
        F.greatest(a["prev"], end(p)).alias("prev"),
    )
    return F.aggregate(ps_col, acc0, step, lambda a: a["cov"])


def span_dedup_stats(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document span-duplication profile: total spans, spans shared
    verbatim with another document, and the fraction of token positions
    covered by at least one shared span (the mass span-dedup would strip).

    Columns: ``id, n_toks, n_spans, n_dup_spans, dup_tokens, dup_frac``.
    """
    m = _marked(docs, k, id_col, text_col)
    g = m.groupBy(id_col).agg(
        F.first("n_toks").alias("n_toks"),
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum(F.col("__dup").cast("int")).cast("int").alias("n_dup_spans"),
        F.sort_array(
            F.collect_list(F.when(F.col("__dup"), F.col("pos")))
        ).alias("__ps"),
    )
    return g.select(
        id_col,
        "n_toks",
        "n_spans",
        "n_dup_spans",
        _covered_tokens(F.col("__ps"), F.col("n_toks"), k)
        .cast("int")
        .alias("dup_tokens"),
    ).withColumn(
        "dup_frac", F.round(F.col("dup_tokens") / F.col("n_toks"), 6)
    )


def strip_duplicated_spans(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Span-dedup a corpus: remove every token covered by a cross-document
    duplicate k-token span; keep the unique remainder in document order
    (Lee et al. 2022 semantics, both occurrences stripped).

    Columns: ``id, clean_text, n_kept`` (normalized tokens kept, in
    document order). The sorted duplicate starts merge into disjoint
    [s, e] islands (in-row fold), the islands invert into the gap
    intervals between them, and the kept text is the concat of ``slice``
    views of the token array over those gaps — O(n_toks + n_islands) per
    row, and NO lambda body references an outer expression (the
    per-element re-expansion trap: Catalyst re-evaluates such a subtree
    once per array element).
    """
    m = _marked(docs, k, id_col, text_col)
    dup_ps = (
        m.filter("__dup")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
    )
    # stage 1: materialize words / n_toks / starts as plain columns so the
    # stage-2 lambdas only touch cheap attributes (the words alias is
    # consumed twice below, which also keeps CollapseProject from inlining
    # the split chain back into a lambda body)
    words = normalized_tokens(text_col)
    base = (
        docs.join(dup_ps, id_col, "left")
        .select(
            id_col,
            words.alias("__w"),
            F.coalesce("__ps", F.array().cast("array<int>")).alias("__ps"),
        )
        .withColumn("__n", F.size("__w"))
    )
    # merge sorted starts into disjoint [s, e] islands (same fold as the
    # stats coverage, accumulating the intervals instead of their length)
    end = lambda p: F.least(p + F.lit(k - 1), F.col("__n"))  # noqa: E731
    acc0 = F.struct(
        F.array().cast("array<struct<s:int,e:int>>").alias("iv"),
        F.lit(0).cast("int").alias("s"),
        F.lit(0).cast("int").alias("e"),
    )
    flush = lambda a: F.when(  # noqa: E731
        a["s"] > 0,
        F.concat(a["iv"], F.array(F.struct(a["s"].alias("s"), a["e"].alias("e")))),
    ).otherwise(a["iv"])
    step = lambda a, p: F.when(  # noqa: E731
        (a["s"] > 0) & (p <= a["e"] + 1),
        F.struct(a["iv"].alias("iv"), a["s"].alias("s"),
                 F.greatest(a["e"], end(p)).alias("e")),
    ).otherwise(
        F.struct(flush(a).alias("iv"), p.cast("int").alias("s"),
                 end(p).cast("int").alias("e"))
    )
    staged = base.withColumn("__iv", F.aggregate(F.col("__ps"), acc0, step, flush))
    # invert islands [s_1,e_1],..,[s_m,e_m] into gaps: starts = [1, e_i+1],
    # ends = [s_i-1, n] — zip aligns gap_j = (prev island end + 1, next
    # island start - 1); empty gaps slice to [] via the 0-length guard
    gap_s = F.concat(
        F.array(F.lit(1)), F.transform("__iv", lambda v: v["e"] + 1)
    )
    gap_e = F.concat(
        F.transform("__iv", lambda v: v["s"] - 1), F.array(F.col("__n"))
    )
    staged = staged.withColumn("__gaps", F.arrays_zip(gap_s.alias("s"), gap_e.alias("e")))
    kept = F.flatten(
        F.transform(
            "__gaps",
            lambda g: F.slice(
                F.col("__w"), g["s"], F.greatest(g["e"] - g["s"] + 1, F.lit(0))
            ),
        )
    )
    return staged.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size(kept).cast("int").alias("n_kept"),
    )
