"""Driver queries for the deterministic sampling / data-mixture operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from battetl_spark.queries._shared import _t

# target size mixture over languages (weights sum to 1) and the char budget
MIX_WEIGHTS = {"en": 0.4, "de": 0.2, "es": 0.15, "fr": 0.15, "zh": 0.1}
MIX_BUDGET = 40_000.0
SOURCE_CAP = 10


def q_doc_mixture_sample(spark, sf):
    """Data-mixing sampler: per-language rates calibrated so each language
    contributes ~weight x budget of character mass, membership decided by
    a deterministic md5-derived uniform (bit-identical in DuckDB). One tiny
    aggregate + broadcast join; the corpus itself never shuffles."""
    from battetl_spark.analytics.sampling import calibrated_mixture_sample

    docs = _t(spark, sf, "documents")
    out = calibrated_mixture_sample(
        docs, "lang", MIX_WEIGHTS, MIX_BUDGET, size_col="n_chars", seed=0
    )
    return out.select("doc_id", "lang")


def q_doc_source_cap(spark, sf):
    """Domain-cap: at most SOURCE_CAP docs per source, keeping the largest
    (n_chars desc, doc_id tiebreak). Under-cap strata bypass the ranking
    window via a broadcast count map — only over-cap rows shuffle."""
    from battetl_spark.analytics.sampling import cap_per_stratum

    docs = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    out = cap_per_stratum(
        docs, "source", SOURCE_CAP, [F.col("n_chars").desc()]
    )
    return out.select("doc_id", "source")


PACK_SEQ_LEN = 128


def q_doc_pack_sequences(spark, sf):
    """Sequence packing (concat-and-chunk): the corpus in deterministic
    md5-shuffled order, concatenated and cut every PACK_SEQ_LEN tokens;
    one row per (chunk, document-span). The distributed two-pass prefix
    sum must reproduce DuckDB's global running-sum window exactly (shard
    boundaries are invisible: the shard id is monotone in the order key)."""
    from battetl_spark.analytics.packing import pack_documents

    docs = _t(spark, sf, "documents")
    return pack_documents(docs, PACK_SEQ_LEN, seed=0)


def q_doc_pack_chunks(spark, sf):
    """Materialized packed sequences: the pack plan joined back to the
    corpus, spans sliced and reassembled per chunk (one join + one
    groupBy(chunk_id) — the honest byte-moving cost of packing). Emitted
    as text so DuckDB's ordered string_agg reproduces it exactly."""
    from battetl_spark.analytics.packing import materialize_chunks, pack_documents

    docs = _t(spark, sf, "documents")
    plan = pack_documents(docs, PACK_SEQ_LEN, seed=0)
    out = materialize_chunks(docs, plan)
    return out.select(
        "chunk_id",
        "n_toks",
        F.concat_ws(" ", F.col("tokens")).alias("chunk_text"),
    )


SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}
SPLIT_SEED = 7


def q_doc_split_assign(spark, sf):
    """Deterministic train/val/test assignment: one split per document by
    the md5-derived 52-bit uniform against cumulative fraction thresholds.
    Map-only (zero shuffle); the same doc lands in the same split on any
    cluster size / retry / engine — the leak-free-eval-set property."""
    from battetl_spark.analytics.sampling import assign_split

    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    return assign_split(docs, SPLIT_FRACTIONS, seed=SPLIT_SEED)
