"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator family from SURVEY.md §2
(reference file:line cited inline); ``oracle_sql()`` carries the DuckDB
equivalent run by the driver at sf=0.01. Column names/aliases match exactly
on both sides; float results are rounded identically on both sides so the
order-insensitive value hash is stable under distributed summation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF1 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# CDC / incremental-load operator family (SURVEY §2.3, reference Loader.py)
# --------------------------------------------------------------------------

def q_lww_latest_per_key(spark, sf):
    """U1/U2: last-writer-wins winner per key by ordering column
    (reference Loader.py:236-332 overwrite semantics). agg+max_by keeps the
    reduction map-side combinable (skew-safe) vs a window sort."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.round(F.max_by("value", "event_id"), 6).alias("last_value"),
        F.max_by("ts", "event_id").alias("last_ts"),
    )


def q_cdc_replay(spark, sf):
    """Full LWW replay with delete ops: event_type='error' acts as a delete
    tombstone for the key; final live state only (engine semantics of
    battetl_spark.cdc.merge, oracle-expressible)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return last.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 6).alias("last_value"),
    )


def q_watermark_filter(spark, sf):
    """U1: high-watermark append — only rows above MAX/2 watermark survive
    (reference Loader.py:174-180, watermark lookup 1090-1100)."""
    ev = _t(spark, sf, "events")
    wm = ev.agg((F.max("event_id") / 2.0).alias("wm"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("event_id") > F.col("wm"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_new"), F.min("event_id").alias("first_new_id"))
    )


def q_dim_upsert_keys(spark, sf):
    """U3: lookup-or-insert dim keys with deterministic surrogate ids
    (reference Loader.py:526-1008; serial RETURNING → md5 natural-key hash)."""
    ev = _t(spark, sf, "events")
    return (
        ev.select("user_id", "event_type")
        .distinct()
        .select(
            "user_id",
            "event_type",
            F.md5(
                F.concat_ws("|", F.col("user_id").cast("string"), "event_type")
            ).alias("surrogate_id"),
        )
    )


def q_minmax_meta_refresh(spark, sf):
    """U4: post-load meta refresh — first/last recorded datetime per test
    (reference Loader.py:1245-1281)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_recorded"),
        F.max("ts").alias("last_recorded"),
        F.count("*").alias("n_rows"),
    )


def q_anti_join_new_keys(spark, sf):
    """J4: dedup anti-join — incoming (user, hour) slots not already in the
    table (reference Loader.py:174-180 re-load inserts 0 rows). Keyed on
    (user_id, hour) with a 99% watermark so the tail contains genuinely new
    slots and the green row carries information (round-1 shape was vacuous:
    every user existed on both sides)."""
    ev = _t(spark, sf, "events")
    wm = ev.agg((F.max("event_id") * 0.99).alias("wm"))
    hour = F.date_trunc("hour", F.col("ts")).alias("bucket_hour")
    existing = (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("event_id") <= F.col("wm"))
        .select("user_id", hour)
        .distinct()
    )
    incoming = (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("event_id") > F.col("wm"))
        .select("user_id", hour)
        .distinct()
    )
    return incoming.join(existing, ["user_id", "bucket_hour"], "left_anti")


# --------------------------------------------------------------------------
# Window / aggregation family (SURVEY §2.5, reference Transformer.py:413-724)
# --------------------------------------------------------------------------

def q_running_cumsum(spark, sf):
    """A3: cumulative value over ordered frame per key (cumulative-capacity
    pattern, Transformer.py:614-724)."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("cum_value"),
    )


def q_lag_delta(spark, sf):
    """A5: per-sample deltas via lag + conditional per-key sums (CC/CV split
    pattern, Transformer.py:704-719)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.withColumn("delta", F.col("value") - F.lag("value").over(w))
    return d.groupBy("user_id").agg(
        F.round(F.sum(F.when(F.col("delta") > 0, F.col("delta"))), 6).alias(
            "sum_pos_delta"
        ),
        F.count(F.when(F.col("delta") < 0, 1)).alias("n_neg_delta"),
    )


def q_fractional_crossing(spark, sf):
    """A6: first position where the running total crosses 50% of the final
    (50%/80% charge-time pattern, Transformer.py:536-551)."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("user_id")
    d = ev.select(
        "user_id",
        "event_id",
        F.sum("value").over(w).alias("cum"),
        F.sum("value").over(tot).alias("total"),
    )
    return d.groupBy("user_id").agg(
        F.min(
            F.when(F.col("cum") >= 0.5 * F.col("total"), F.col("event_id"))
        ).alias("half_crossing_event_id")
    )


def q_first_last(spark, sf):
    """O4/J5: first/last row per key by order (reference Loader.py:1259-1277
    ORDER BY ... LIMIT 1 scalar subqueries)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
    )


def q_user_rollup(spark, sf):
    """Conversation-stats analog (SURVEY §7.9): per-key counts per class,
    last payload, totals — one shuffle, partial-agg friendly."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchase"
        ),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def q_groupby_agg(spark, sf):
    """A1/A10: TPC-H-Q1-style grouped aggregate on lineitem."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_join_enrich(spark, sf):
    """J1: fact ⋈ broadcast dim + grouped rollup (reference pandas join
    Transformer.py:479-483)."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_sorted_topk(spark, sf):
    """O1/O6: deterministic top-k (value desc, id asc tiebreak)."""
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
        .limit(100)
    )


def q_union_distinct(spark, sf):
    """E1: multi-source union + distinct (reference concat
    Extractor.py:716-736)."""
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------
# Scalar transform family (SURVEY §2.2, reference utils.py / Transformer.py)
# --------------------------------------------------------------------------

def q_unit_milli_scale(spark, sf):
    """P6: thousands-comma strip + ×1e3 unit scaling (utils.py:256-281).
    The comma string is synthesized then parsed back — exercises the real
    expression chain."""
    from battetl_spark.functions.core import to_milli

    ev = _t(spark, sf, "events")
    # synthesize a thousands-comma numeric string '<A>,<BBB>.25'
    pretty = F.concat(
        F.floor("value").cast("int").cast("string"),
        F.lit(","),
        F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0"),
        F.lit(".25"),
    )
    return ev.select(
        "event_id", F.round(to_milli(pretty), 2).alias("value_milli")
    )


def q_interval_parse(spark, sf):
    """P10/P11: '1d HH:MM:SS.f' interval → seconds (utils.py:307-330) —
    golden-style: synthesized interval strings, closed-form oracle."""
    from battetl_spark.functions.core import interval_to_seconds

    ev = _t(spark, sf, "events")
    s = F.concat(
        (F.col("user_id") % 3).cast("string"),
        F.lit("d 12:34:"),
        F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
    )
    return ev.select(
        "event_id",
        F.round(interval_to_seconds(s), 3).alias("interval_s"),
    )


def q_datetime_parse_roundtrip(spark, sf):
    """P7/P9: multi-format datetime fast-path + unixtime derivation
    (utils.py:361-399, Transformer.py:302-323)."""
    from battetl_spark.functions.core import parse_datetime_multi, unixtime_s

    ev = _t(spark, sf, "events")
    txt = F.when(
        F.col("event_id") % 2 == 0,
        F.date_format("ts", "MM/dd/yyyy HH:mm:ss"),
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    parsed = parse_datetime_multi(txt)
    return ev.select("event_id", unixtime_s(parsed).alias("unixtime_s"))


def q_tz_to_utc(spark, sf):
    """P8: localize naive timestamps to America/Los_Angeles then convert to
    UTC (utils.py:332-359); returned as epoch seconds."""
    from battetl_spark.functions.core import to_utc, unixtime_s

    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", unixtime_s(to_utc("ts")).alias("utc_unixtime_s")
    )


def q_json_extract(spark, sf):
    """P15-adjacent: JSON prop extraction + grouped stats over the open
    'props' column (reference other_details JSON, Loader.py:495-524)."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.when(k.isNull(), 1)).alias("n_null_k")
    )


def q_json_pack(spark, sf):
    """P15: leftover columns → JSON string with null stripping
    (Loader.py:495-524), native to_json."""
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_type"), F.col("user_id")),
        ).alias("other_details"),
    )


# --------------------------------------------------------------------------
# Relational operators Spark lacks as built-ins (composed, pure Catalyst)
# --------------------------------------------------------------------------

def q_asof_join(spark, sf):
    """As-of join: each purchase enriched with the latest prior view's value
    per user (log-structured union+forward-fill idiom, one shuffle)."""
    from battetl_spark.operators import asof_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.round("value", 6).alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.round("value", 6).alias("value")
    )
    out = asof_join(purchases, views, ["user_id"], "event_id", ["value"])
    return out.select(
        "user_id", "event_id", "purchase_value",
        F.round("value_asof", 6).alias("value_asof"),
    )


def q_range_join_count(spark, sf):
    """Range join: views within the 1000 event-ids before each purchase."""
    from battetl_spark.operators import range_join_count

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id")
    return range_join_count(purchases, views, ["user_id"], "event_id", 0, 1000)


def q_time_bucket_rollup(spark, sf):
    """Hypertable rollup: hourly buckets per event_type."""
    from battetl_spark.operators import time_bucket_rollup

    ev = _t(spark, sf, "events")
    return time_bucket_rollup(
        ev, "ts", "hour", ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")],
    )


def q_sessionize(spark, sf):
    """Gap-based sessionization (1h gap) → sessions per user."""
    from battetl_spark.operators import sessionize

    ev = _t(spark, sf, "events")
    s = sessionize(ev, ["user_id"], "ts", 3600.0)
    return s.groupBy("user_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Training-data pipeline family (documents / embeddings)
# --------------------------------------------------------------------------

def q_doc_exact_dedup(spark, sf):
    from battetl_spark.analytics.textops import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def q_doc_token_count(spark, sf):
    from battetl_spark.analytics.textops import token_count

    d = _t(spark, sf, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


def q_doc_quality(spark, sf):
    from battetl_spark.analytics.textops import quality_features

    d = _t(spark, sf, "documents")
    return quality_features(d).select(
        "doc_id", "q_n_tokens", "q_punct_ratio", "q_stop_ratio", "q_score"
    )


def q_doc_langid(spark, sf):
    from battetl_spark.analytics.textops import lang_id

    d = _t(spark, sf, "documents")
    return lang_id(d).groupBy("pred_lang").agg(F.count("*").alias("n_docs"))


def q_doc_fingerprint(spark, sf):
    from battetl_spark.analytics.textops import normalized_text

    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.md5(normalized_text("text")).alias("content_md5"))


def q_doc_bpe_tokens(spark, sf):
    from battetl_spark.analytics.textops import bpe_ish_token_count

    d = _t(spark, sf, "documents")
    return d.select("doc_id", bpe_ish_token_count("text").alias("n_pieces"))


def q_doc_ngram_jaccard(spark, sf):
    """Exact n-gram Jaccard pairs via prefix-filter (AllPairs/PPJoin)
    blocking — GUARANTEED recall, so the output equals the exhaustive
    all-pairs DuckDB oracle exactly."""
    from battetl_spark.analytics.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.4)


def q_doc_minhash_dedup(spark, sf):
    """MinHash-LSH candidates + exact-Jaccard verify: emitted pairs equal the
    exhaustive all-pairs answer (per-pair miss prob ~8e-8 at j=0.8 with
    16 bands of 2 hashes; the corpus's true pairs sit at j>=0.8), so the
    DuckDB oracle is the ground truth. rows_per_band='auto' (round 5) stays
    at r=2 at driver SFs (candidate mass under budget → identical results)
    and escalates only on low-entropy corpora where fixed r=2 explodes."""
    from battetl_spark.analytics.textops import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf, "documents"),
        num_hashes=32,
        jaccard_threshold=0.8,
        rows_per_band="auto",
        verify="exact",
    )


def q_doc_minhash_incremental(spark, sf):
    """Incremental near-dup against a PERSISTED signature index (round-5):
    the corpus arrives as three deterministic batches (doc_id mod 3); each
    batch computes only its own signatures, band-joins against the stored
    index + itself, exact-verifies, and appends its signatures. The union
    of per-batch pair outputs must equal the full-corpus exhaustive oracle
    (every unordered pair is found exactly once, by the batch ingesting its
    later member). Mirrors the reference's only-new-rows incremental load
    (/root/reference/battetl/load/Loader.py:144-234)."""
    import tempfile

    from pyspark.sql import functions as F

    from battetl_spark.analytics.sig_index import MinHashIndex

    docs = _t(spark, sf, "documents")
    idx = MinHashIndex.create(
        spark, tempfile.mkdtemp(prefix="mh_incr_") + "/idx"
    )
    out = None
    for i in range(3):
        pairs = idx.add_batch(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i),
            jaccard_threshold=0.8,
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out


def q_doc_simhash(spark, sf):
    """SimHash near-dup pairs — signatures are md5-hex bit votes (pure
    Catalyst), blocking is the 4×16-bit pigeonhole (guaranteed recall at
    hamming<=3), so DuckDB reproduces the output bit-for-bit."""
    from battetl_spark.analytics.textops import simhash_near_dups

    return simhash_near_dups(_t(spark, sf, "documents"), max_hamming=3)


def q_ann_cosine_topk(spark, sf):
    """Brute-force exact cosine top-k (oracle: DuckDB list_dot_product)."""
    from battetl_spark.analytics.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=10)


def q_emb_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs (the embedding member of the dedup
    family): banded hyperplane-LSH candidates + exact-cosine verify. The
    corpus's natural max pair cosine is ~0.5, so the query PLANTS dups —
    perturbed copies (x*0.999 + 0.0003, vec_id+100000) of vec_id<25 — and
    the exhaustive all-pairs DuckDB oracle verifies the emitted pairs carry
    information (round-2 verdict: de-vacuize this oracle). Verification is
    the exact cosine (filter on raw, emit rounded), so the banded LSH only
    has to not MISS pairs at cos≈0.999 (miss prob ~1e-38)."""
    from battetl_spark.analytics.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.999 + 0.0003).alias("embedding"),
    )
    return embedding_near_dup_pairs(emb.unionByName(planted), threshold=0.9)


def q_emb_near_dup_incremental(spark, sf):
    """Incremental embedding near-dup against a persisted hyperplane-LSH
    index (round-5): same planted corpus as emb_near_dup, ingested as three
    batches through analytics.EmbeddingIndex — the stored flip masks let an
    OLD smaller id probe toward a new vector's bucket, so the per-batch
    union equals the batch operator (and the exhaustive oracle) exactly."""
    import tempfile

    from battetl_spark.analytics.sig_index import EmbeddingIndex

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.999 + 0.0003).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    idx = EmbeddingIndex.create(
        spark, tempfile.mkdtemp(prefix="emb_incr_") + "/idx"
    )
    out = None
    for i in range(3):
        pairs = idx.add_batch(
            corpus.filter(F.pmod(F.col("vec_id"), F.lit(3)) == i),
            threshold=0.9,
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out


def q_ann_lsh_topk(spark, sf):
    """LSH-bucketed ANN (scale path). Hyperplanes are md5-derived ±1 literal
    arrays and bucket bits come from ORDER-INDEPENDENT integer-quantized
    dots, so DuckDB computes identical buckets and the full approximate
    pipeline is oracle-verified end-to-end."""
    from battetl_spark.analytics.similarity import lsh_cosine_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_cosine_topk(emb, queries, dim=64, k=10, num_planes=4)


# --------------------------------------------------------------------------


def q_corpus_clean(spark, sf):
    """The composed training-data cleaning pipeline: language filter →
    quality filter → exact dedup → exact-verified near-dup dedup. Every
    stage reuses an oracle-green operator, so the whole pipeline is
    oracle-verified end-to-end."""
    from battetl_spark.analytics.textops import clean_corpus

    return clean_corpus(
        _t(spark, sf, "documents"), min_quality=0.5, langs=("en", "de")
    )


def q_ann_ivf_topk(spark, sf):
    """IVF-style ANN: label-cell coarse quantizer, nprobe=2, exact re-rank
    inside probed cells. Centroids are rounded per-dim means → the full
    approximate pipeline is reproduced by the DuckDB oracle."""
    from battetl_spark.analytics.similarity import ivf_cosine_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_cosine_topk(emb, queries, dim=64, k=10, nprobe=2)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW CDC replay with delete semantics at sf0.001."""
    return q_cdc_replay(spark, SF1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lww_latest_per_key": q_lww_latest_per_key,
        "cdc_replay": q_cdc_replay,
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
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_token_count": q_doc_token_count,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "corpus_clean": q_corpus_clean,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "doc_minhash_dedup": q_doc_minhash_dedup,
        "doc_minhash_incremental": q_doc_minhash_incremental,
        "doc_simhash": q_doc_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_near_dup_incremental": q_emb_near_dup_incremental,
    }


def _jaccard_pairs_sql(threshold: float) -> str:
    """Exhaustive all-pairs exact word-3-shingle Jaccard (ground truth for
    both the prefix-filter and the minhash-verified near-dup queries).
    DuckDB computes Jaccard over shingle STRINGS; Spark over shingle HASHES —
    isomorphic set representations (xxhash64 is injective on this corpus)."""
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, greatest(len(w) - 2, 1) + 1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
          FROM norm
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(a.s || b.s)), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) * 1.0
              / len(list_distinct(a.s || b.s)) >= {threshold}
    """


def _simhash_pairs_sql(max_hamming: int) -> str:
    """Exhaustive all-pairs SimHash hamming oracle. Reproduces the engine's
    signature exactly: token hash bit b = bit (b%4) of md5 hex digit b//4;
    vote = sum(±1); signature bit set iff vote > 0; stored as two 32-bit
    halves so xor/bit_count stay sign-free."""
    votes = ", ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1)"
        f" >> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    hi = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    lo = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(0, 32)
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id, md5(t) AS h FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
            FROM documents)
        ),
        bits AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id),
        sigs AS (
          SELECT doc_id, ({hi})::BIGINT AS hi, ({lo})::BIGINT AS lo FROM bits
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT
                 AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
              <= {max_hamming}
    """


def _ann_lsh_sql(dim: int, num_planes: int, k: int) -> str:
    """Full-fidelity oracle of the approximate LSH pipeline: identical
    md5-derived ±1 planes, identical integer-quantized (order-independent)
    bucket bits, identical in-bucket exact-cosine re-rank."""
    from battetl_spark.analytics.similarity import QUANT, plane_signs

    signs = plane_signs(num_planes, dim)
    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product("
        f"list_transform(embedding::DOUBLE[], x -> floor(x * {QUANT})), "
        f"CAST([{', '.join(f'{s}.0' for s in signs[p])}] AS DOUBLE[])) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    ) or "0"
    return f"""
        WITH withb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, ({bucket_terms}) AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, bucket FROM withb
          WHERE vec_id < 5
        ),
        sims AS (
          SELECT q.query_id, e.vec_id,
                 round(list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
          FROM withb e JOIN q ON e.bucket = q.bucket
          WHERE e.vec_id <> q.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS rank
          FROM sims
        )
        SELECT query_id, vec_id, cos_sim, rank::INT AS rank
        FROM ranked WHERE rank <= {k}
    """


def oracle_sql() -> dict[str, str]:
    stop = r"\b(the|a|and|of|to|in|is|it|for|on)\b"
    lang_scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '\\b({'|'.join(m)})\\b')) AS s_{lg}"
        for lg, m in {
            "en": ["the", "and", "is", "of", "to"],
            "es": ["el", "la", "de", "que", "y"],
            "de": ["der", "die", "und", "das", "ist"],
            "fr": ["le", "la", "les", "et", "est"],
        }.items()
    )
    return {
        "lww_latest_per_key": """
            SELECT user_id,
                   max(event_id) AS last_event_id,
                   arg_max(event_type, event_id) AS last_event_type,
                   round(arg_max(value, event_id), 6) AS last_value,
                   arg_max(ts, event_id) AS last_ts
            FROM events GROUP BY user_id
        """,
        "cdc_replay": """
            WITH ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id DESC) AS rn
              FROM events
            )
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type,
                   round(value, 6) AS last_value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "watermark_filter": """
            SELECT user_id, count(*)::BIGINT AS n_new,
                   min(event_id) AS first_new_id
            FROM events
            WHERE event_id > (SELECT max(event_id) / 2.0 FROM events)
            GROUP BY user_id
        """,
        "dim_upsert_keys": """
            SELECT DISTINCT user_id, event_type,
                   md5(user_id::VARCHAR || '|' || event_type) AS surrogate_id
            FROM events
        """,
        "minmax_meta_refresh": """
            SELECT user_id, min(ts) AS first_recorded, max(ts) AS last_recorded,
                   count(*)::BIGINT AS n_rows
            FROM events GROUP BY user_id
        """,
        "anti_join_new_keys": """
            WITH wm AS (SELECT max(event_id) * 0.99 AS w FROM events),
            existing AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket_hour
                         FROM events, wm WHERE event_id <= w),
            incoming AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket_hour
                         FROM events, wm WHERE event_id > w)
            SELECT i.user_id, i.bucket_hour
            FROM incoming i LEFT JOIN existing e
              ON i.user_id = e.user_id AND i.bucket_hour = e.bucket_hour
            WHERE e.user_id IS NULL
        """,
        "running_cumsum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cum_value
            FROM events WHERE user_id < 40
        """,
        "lag_delta": """
            WITH d AS (
              SELECT user_id,
                     value - lag(value) OVER (PARTITION BY user_id
                                              ORDER BY event_id) AS delta
              FROM events
            )
            SELECT user_id,
                   round(sum(CASE WHEN delta > 0 THEN delta END), 6) AS sum_pos_delta,
                   count(CASE WHEN delta < 0 THEN 1 END)::BIGINT AS n_neg_delta
            FROM d GROUP BY user_id
        """,
        "fractional_crossing": """
            WITH d AS (
              SELECT user_id, event_id,
                     sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     sum(value) OVER (PARTITION BY user_id) AS total
              FROM events WHERE user_id < 40
            )
            SELECT user_id,
                   min(CASE WHEN cum >= 0.5 * total THEN event_id END)
                   AS half_crossing_event_id
            FROM d GROUP BY user_id
        """,
        "first_last": """
            SELECT user_id,
                   arg_min(value, event_id) AS first_value,
                   arg_max(value, event_id) AS last_value
            FROM events GROUP BY user_id
        """,
        "user_rollup": """
            SELECT user_id, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   round(sum(value), 4) AS total_value,
                   max(ts) AS last_ts
            FROM events GROUP BY user_id
        """,
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_enrich": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "sorted_topk": """
            SELECT event_id, user_id, round(value, 6) AS value
            FROM events ORDER BY value DESC, event_id LIMIT 100
        """,
        "union_distinct": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT user_id FROM events WHERE event_type = 'purchase'
            )
        """,
        "unit_milli_scale": """
            SELECT event_id,
                   round((floor(value) * 1000 + event_id % 1000 + 0.25) * 1000,
                         2) AS value_milli
            FROM events
        """,
        "interval_parse": """
            SELECT event_id,
                   round((user_id % 3) * 86400 + 12 * 3600 + 34 * 60
                         + (event_id % 60), 3)::DOUBLE AS interval_s
            FROM events
        """,
        "datetime_parse_roundtrip": """
            SELECT event_id,
                   floor(epoch(ts))::BIGINT AS unixtime_s
            FROM events
        """,
        "tz_to_utc": """
            SELECT event_id,
                   floor(epoch(ts AT TIME ZONE 'America/Los_Angeles'))::BIGINT
                   AS utc_unixtime_s
            FROM events
        """,
        "json_extract": """
            SELECT event_type,
                   sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   count(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 END)::BIGINT AS n_null_k
            FROM events GROUP BY event_type
        """,
        "json_pack": """
            SELECT event_id,
                   to_json(struct_pack(event_type := event_type,
                                       user_id := user_id)) AS other_details
            FROM events WHERE event_id < 1000
        """,
        "asof_join": """
            WITH p AS (SELECT user_id, event_id, round(value, 6) AS purchase_value
                       FROM events WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, event_id, round(value, 6) AS value
                       FROM events WHERE event_type = 'view')
            SELECT p.user_id, p.event_id, p.purchase_value,
                   round(v.value, 6) AS value_asof
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.event_id >= v.event_id
        """,
        "range_join_count": """
            WITH p AS (SELECT user_id, event_id FROM events
                       WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, event_id FROM events
                       WHERE event_type = 'view')
            SELECT p.user_id, p.event_id,
                   count(v.event_id)::BIGINT AS n_in_range
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id
             AND v.event_id >= p.event_id - 1000
             AND v.event_id < p.event_id
            GROUP BY p.user_id, p.event_id
        """,
        "time_bucket_rollup": """
            SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
                   count(*)::BIGINT AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts)) > 3600
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
            )
            SELECT user_id, sum(new_sess)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM g GROUP BY user_id
        """,
        "doc_exact_dedup": """
            SELECT md5(text) AS digest, min(doc_id) AS keep_id,
                   count(*)::BIGINT AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "doc_token_count": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+'))::INT AS n_tokens
            FROM documents
        """,
        "doc_quality": rf"""
            WITH f AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     len(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace
              FROM documents
            )
            SELECT doc_id, n_tokens::INT AS q_n_tokens,
                   round(n_punct / greatest(n_chars, 1), 6) AS q_punct_ratio,
                   round(n_stop / greatest(n_tokens, 1), 6) AS q_stop_ratio,
                   round(
                     least(n_tokens / 64.0, 1.0) * 0.4
                     + least((n_stop / greatest(n_tokens, 1)) * 4.0, 1.0) * 0.3
                     + (1.0 - least((n_punct / greatest(n_chars, 1)) * 10.0, 1.0)) * 0.2
                     + (CASE WHEN n_nospace / greatest(n_tokens, 1) BETWEEN 3 AND 8
                        THEN 0.1 ELSE 0.0 END), 6) AS q_score
            FROM f
        """,
        "doc_langid": rf"""
            WITH s AS (SELECT doc_id, {lang_scores} FROM documents),
            p AS (
              SELECT doc_id,
                     greatest(s_de, s_en, s_es, s_fr) AS best,
                     CASE
                       WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                       ELSE 'fr'
                     END AS pred_lang
              FROM s
            )
            SELECT pred_lang, count(*)::BIGINT AS n_docs FROM p GROUP BY pred_lang
        """,
        "doc_bpe_tokens": r"""
            SELECT doc_id,
                   list_sum(list_transform(
                       regexp_split_to_array(trim(text), '\s+'),
                       w -> ceil(length(w) / 4.0)))::INT AS n_pieces
            FROM documents
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS content_md5
            FROM documents
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, cos_sim, rank::INT AS rank
            FROM ranked WHERE rank <= 10
        """,
        "corpus_clean": rf"""
            WITH f AS (
              SELECT doc_id, lang, text,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     len(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace
              FROM documents WHERE lang IN ('en', 'de')
            ),
            scored AS (
              SELECT doc_id, lang, text,
                     round(
                       least(n_tokens / 64.0, 1.0) * 0.4
                       + least((n_stop / greatest(n_tokens, 1)) * 4.0, 1.0) * 0.3
                       + (1.0 - least((n_punct / greatest(n_chars, 1)) * 10.0,
                                      1.0)) * 0.2
                       + (CASE WHEN n_nospace / greatest(n_tokens, 1)
                          BETWEEN 3 AND 8 THEN 0.1 ELSE 0.0 END), 6) AS q_score
              FROM f
            ),
            filtered AS (SELECT * FROM scored WHERE q_score >= 0.5),
            winners AS (
              SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
            ),
            kept AS (SELECT s.* FROM filtered s JOIN winners USING (doc_id)),
            norm AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM kept
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(w) - 2, 1) + 1),
                         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
              FROM norm
            ),
            losers AS (
              SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(a.s || b.s)) >= 0.8
            )
            SELECT k.doc_id, k.lang, k.q_score
            FROM kept k LEFT JOIN losers l ON k.doc_id = l.doc_id
            WHERE l.doc_id IS NULL
        """,
        "ann_ivf_topk": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            flat AS (SELECT label, unnest(v) AS val,
                            generate_subscripts(v, 1) AS dim FROM e),
            cent AS (
              SELECT label, list(round(a, 6) ORDER BY dim) AS c
              FROM (SELECT label, dim, avg(val) AS a FROM flat
                    GROUP BY label, dim)
              GROUP BY label
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            probes AS (
              SELECT query_id, label, qv FROM (
                SELECT q.query_id, cent.label, q.qv,
                       row_number() OVER (
                         PARTITION BY q.query_id
                         ORDER BY round(list_dot_product(q.qv, cent.c)
                               / (sqrt(list_dot_product(q.qv, q.qv))
                                  * sqrt(list_dot_product(cent.c, cent.c))), 9)
                               DESC, cent.label) AS cr
                FROM q, cent)
              WHERE cr <= 2
            ),
            sims AS (
              SELECT p.query_id, e.vec_id,
                     round(list_dot_product(e.v, p.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(p.qv, p.qv))), 6)
                       AS cos_sim
              FROM e JOIN probes p ON e.label = p.label
              WHERE e.vec_id <> p.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, cos_sim, rank::INT AS rank
            FROM ranked WHERE rank <= 10
        """,
        "emb_near_dup": """
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 100000, list_transform(v, x -> x * 0.999 + 0.0003)
              FROM base WHERE vec_id < 25
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS c
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 6) AS cos_sim
            FROM pairs WHERE c >= 0.9
        """,
        "emb_near_dup_incremental": """
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 100000, list_transform(v, x -> x * 0.999 + 0.0003)
              FROM base WHERE vec_id < 25
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS c
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 6) AS cos_sim
            FROM pairs WHERE c >= 0.9
        """,
        "doc_ngram_jaccard": _jaccard_pairs_sql(0.4),
        "doc_minhash_dedup": _jaccard_pairs_sql(0.8),
        "doc_minhash_incremental": _jaccard_pairs_sql(0.8),
        "doc_simhash": _simhash_pairs_sql(3),
        "ann_lsh_topk": _ann_lsh_sql(dim=64, num_planes=4, k=10),
    }
