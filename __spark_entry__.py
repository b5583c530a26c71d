"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator family from SURVEY.md §2
(reference file:line cited inline in battetl_spark/queries/*); 
``oracle_sql()`` carries the DuckDB equivalent run by the driver at
sf=0.01. Column names/aliases match exactly on both sides; float results
are rounded identically on both sides so the order-insensitive value hash
is stable under distributed summation.

Round 5: the query implementations moved verbatim into
``battetl_spark/queries/`` (one module per operator family — cdc, windows,
scalars, relational, text, ann — plus oracles) so per-query driver
plan-build cost attributes to one file; this module is the thin aggregator
the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from battetl_spark.queries import *  # noqa: F401,F403
from battetl_spark.queries import _t  # noqa: F401
from battetl_spark.queries.oracles import oracle_sql  # noqa: F401

SF1 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW CDC replay with delete semantics at sf0.001."""
    return q_cdc_replay(spark, SF1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lww_latest_per_key": q_lww_latest_per_key,
        "cdc_replay": q_cdc_replay,
        "cdc_history": q_cdc_history,
        "cdc_history_incremental": q_cdc_history_incremental,
        "cdc_asof_state": q_cdc_asof_state,
        "watermark_filter": q_watermark_filter,
        "dim_upsert_keys": q_dim_upsert_keys,
        "minmax_meta_refresh": q_minmax_meta_refresh,
        "anti_join_new_keys": q_anti_join_new_keys,
        "running_cumsum": q_running_cumsum,
        "lag_delta": q_lag_delta,
        "fractional_crossing": q_fractional_crossing,
        "first_last": q_first_last,
        "user_rollup": q_user_rollup,
        "groupby_agg": q_groupby_agg,
        "join_enrich": q_join_enrich,
        "sorted_topk": q_sorted_topk,
        "union_distinct": q_union_distinct,
        "unit_milli_scale": q_unit_milli_scale,
        "interval_parse": q_interval_parse,
        "datetime_parse_roundtrip": q_datetime_parse_roundtrip,
        "tz_to_utc": q_tz_to_utc,
        "json_extract": q_json_extract,
        "json_pack": q_json_pack,
        "asof_join": q_asof_join,
        "range_join_count": q_range_join_count,
        "time_bucket_rollup": q_time_bucket_rollup,
        "sessionize": q_sessionize,
        "event_funnel": q_event_funnel,
        "event_retention": q_event_retention,
        "event_quantiles": q_event_quantiles,
        "event_active_users": q_event_active_users,
        "event_pivot": q_event_pivot,
        "doc_corpus_profile": q_doc_corpus_profile,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_token_count": q_doc_token_count,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "corpus_clean": q_corpus_clean,
        "corpus_clean_incremental": q_corpus_clean_incremental,
        "corpus_clean_ooo": q_corpus_clean_ooo,
        "corpus_clean_stream": q_corpus_clean_stream,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "doc_ngram_incremental": q_doc_ngram_incremental,
        "doc_minhash_dedup": q_doc_minhash_dedup,
        "doc_minhash_incremental": q_doc_minhash_incremental,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_cluster_reps": q_doc_cluster_reps,
        "doc_dup_clusters_incremental": q_doc_dup_clusters_incremental,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_redact_pii": q_doc_redact_pii,
        "doc_repetition": q_doc_repetition,
        "doc_span_stats": q_doc_span_stats,
        "doc_span_dedup": q_doc_span_dedup,
        "doc_span_incremental": q_doc_span_incremental,
        "doc_frequent_ngrams": q_doc_frequent_ngrams,
        "doc_tfidf_terms": q_doc_tfidf_terms,
        "doc_mixture_sample": q_doc_mixture_sample,
        "doc_source_cap": q_doc_source_cap,
        "doc_split_assign": q_doc_split_assign,
        "doc_pack_sequences": q_doc_pack_sequences,
        "doc_pack_chunks": q_doc_pack_chunks,
        "doc_simhash": q_doc_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_near_dup_incremental": q_emb_near_dup_incremental,
    }
