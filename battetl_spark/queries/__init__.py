"""Driver-contract query surface, split by operator family (round 5).

__spark_entry__.py aggregates these into queries()/oracle_sql(); keeping
each family in its own module makes per-query driver plan-build cost
(py4j chatter — the round-4 lesson) attributable to one file.
"""

from battetl_spark.queries.cdc import (  # noqa: F401
    q_cdc_history,
    q_cdc_history_incremental,
    q_cdc_asof_state,
    q_lww_latest_per_key,
    q_cdc_replay,
    q_watermark_filter,
    q_dim_upsert_keys,
    q_minmax_meta_refresh,
    q_anti_join_new_keys,
)
from battetl_spark.queries.windows import (  # noqa: F401
    q_running_cumsum,
    q_lag_delta,
    q_fractional_crossing,
    q_first_last,
    q_user_rollup,
    q_groupby_agg,
    q_join_enrich,
    q_sorted_topk,
    q_union_distinct,
)
from battetl_spark.queries.scalars import (  # noqa: F401
    q_unit_milli_scale,
    q_interval_parse,
    q_datetime_parse_roundtrip,
    q_tz_to_utc,
    q_json_extract,
    q_json_pack,
)
from battetl_spark.queries.relational import (  # noqa: F401
    q_asof_join,
    q_range_join_count,
    q_time_bucket_rollup,
    q_sessionize,
    q_event_funnel,
    q_event_retention,
    q_event_quantiles,
    q_event_active_users,
    q_event_pivot,
    q_doc_corpus_profile,
)
from battetl_spark.queries.text import (  # noqa: F401
    q_doc_exact_dedup,
    q_doc_token_count,
    q_doc_quality,
    q_doc_langid,
    q_doc_fingerprint,
    q_doc_bpe_tokens,
    q_doc_ngram_jaccard,
    q_doc_ngram_incremental,
    q_doc_minhash_dedup,
    q_doc_minhash_incremental,
    q_doc_dup_clusters,
    q_doc_cluster_reps,
    q_doc_dup_clusters_incremental,
    q_doc_decontaminate,
    q_doc_redact_pii,
    q_doc_repetition,
    q_doc_span_stats,
    q_doc_span_dedup,
    q_doc_span_incremental,
    q_doc_frequent_ngrams,
    q_doc_tfidf_terms,
    q_doc_simhash,
    q_corpus_clean,
    q_corpus_clean_incremental,
    q_corpus_clean_ooo,
    q_corpus_clean_stream,
)
from battetl_spark.queries.sampling import (  # noqa: F401
    q_doc_mixture_sample,
    q_doc_source_cap,
    q_doc_pack_sequences,
    q_doc_pack_chunks,
    q_doc_split_assign,
)
from battetl_spark.queries.ann import (  # noqa: F401
    q_ann_cosine_topk,
    q_emb_near_dup,
    q_emb_near_dup_incremental,
    q_ann_lsh_topk,
    q_ann_ivf_topk,
)

from battetl_spark.queries._shared import _t  # noqa: F401
from battetl_spark.queries.oracles import oracle_sql  # noqa: F401
