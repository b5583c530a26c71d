"""Training-data pipeline operators over the driver's documents/embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from battetl_spark.analytics import textops as TX
from battetl_spark.analytics.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from battetl_spark.analytics.similarity import cosine_topk, lsh_cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup(spark, docs):
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    with_dups = docs.unionByName(dup)
    out = TX.exact_dedup(with_dups)
    assert out.filter("n_copies = 2").count() == 3
    # winners are the original (min) ids
    assert out.filter("n_copies = 2").filter("keep_id >= 1000000").count() == 0


def test_token_count_and_quality(spark, docs):
    q = TX.quality_features(docs)
    row = q.orderBy("doc_id").first()
    assert row.q_n_tokens == len(row.text.split())
    assert 0.0 <= row.q_score <= 1.0
    assert q.filter("q_stop_ratio > 1").count() == 0


def test_lang_id_deterministic(spark, docs):
    out = TX.lang_id(docs).groupBy("pred_lang").count()
    preds = {r.pred_lang for r in out.collect()}
    assert preds <= {"en", "es", "de", "fr", "und"}


def test_fingerprint_stable_under_noise(spark, docs):
    fp1 = TX.fingerprint(docs)
    noisy = docs.withColumn("text", F.concat(F.upper("text"), F.lit("!!!")))
    fp2 = TX.fingerprint(noisy)
    j = fp1.alias("a").join(fp2.alias("b"), "doc_id").select(
        (F.col("a.content_md5") == F.col("b.content_md5")).alias("same")
    )
    assert j.filter("not same").count() == 0  # normalization washes noise out


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    # plant near-dups: copy 5 docs with one appended word
    planted = (
        docs.orderBy("doc_id").limit(5)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
        .withColumn("text", F.concat("text", F.lit(" tail")))
    )
    corpus = docs.unionByName(planted)
    pairs = TX.minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
    hits = pairs.filter("id_b - id_a = 500000").count()
    assert hits >= 4  # minhash is probabilistic; ≥4/5 at j≈0.95


def test_ngram_jaccard_pairs(spark, docs):
    planted = (
        docs.orderBy("doc_id").limit(3)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
    )
    pairs = TX.ngram_jaccard_pairs(docs.unionByName(planted), threshold=0.99)
    assert pairs.filter("id_b - id_a = 500000").count() == 3  # exact copies j=1


def test_simhash_near_dups(spark, docs):
    planted = (
        docs.orderBy("doc_id").limit(3)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
    )
    out = TX.simhash_near_dups(docs.unionByName(planted), max_hamming=0)
    assert out.filter("id_b - id_a = 500000").count() == 3


def test_cosine_topk_exact(spark, emb):
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=5).toPandas()
    assert set(out.groupby("query_id").size()) == {5}
    assert (out.cos_sim <= 1.000001).all()
    # ranks ordered by similarity
    for _, g in out.groupby("query_id"):
        s = g.sort_values("rank").cos_sim.tolist()
        assert s == sorted(s, reverse=True)


def test_lsh_degenerate_equals_exact(spark, emb):
    """num_planes=0 → one bucket → the LSH path must equal brute force
    (machinery equivalence; recall at >0 planes is data-dependent)."""
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=3).toPandas()
    approx = lsh_cosine_topk(emb, queries, dim=64, k=3, num_planes=0).toPandas()
    key = ["query_id", "rank"]
    assert (
        exact.sort_values(key).reset_index(drop=True)[["query_id", "vec_id", "rank"]]
        .equals(
            approx.sort_values(key).reset_index(drop=True)[
                ["query_id", "vec_id", "rank"]
            ]
        )
    )


def test_lsh_bucketed_results_valid(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_cosine_topk(emb, queries, dim=64, k=3, num_planes=4).toPandas()
    assert (out.groupby("query_id").size() <= 3).all()
    for _, g in out.groupby("query_id"):
        s = g.sort_values("rank").cos_sim.tolist()
        assert s == sorted(s, reverse=True)


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 50)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 8 for r in rows)
    plan = frame_sample_plan(media, every_ms=10_000)
    one = plan.groupBy("media_id").count().first()
    assert one["count"] >= 1


def test_ivf_full_probe_equals_exact(spark, emb):
    """nprobe = all cells → IVF must equal brute force (machinery
    equivalence; recall at lower nprobe is data/quantizer-dependent)."""
    from battetl_spark.analytics.similarity import ivf_cosine_topk

    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    n_cells = emb.select("label").distinct().count()
    exact = cosine_topk(emb, queries, k=4).toPandas()
    ivf = ivf_cosine_topk(emb, queries, dim=64, k=4, nprobe=n_cells).toPandas()
    key = ["query_id", "rank"]
    assert (
        exact.sort_values(key).reset_index(drop=True)[["query_id", "vec_id", "rank"]]
        .equals(ivf.sort_values(key).reset_index(drop=True)[["query_id", "vec_id", "rank"]])
    )


def test_ivf_partial_probe_valid(spark, emb):
    from battetl_spark.analytics.similarity import ivf_cosine_topk

    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_cosine_topk(emb, queries, dim=64, k=3, nprobe=2).toPandas()
    assert (out.groupby("query_id").size() <= 3).all()
    for _, g in out.groupby("query_id"):
        s = g.sort_values("rank").cos_sim.tolist()
        assert s == sorted(s, reverse=True)


def test_minhash_estimate_path(spark, docs):
    """verify='estimate' (signature-only, for scales where fetching shingle
    sets is too expensive): planted near-dups still surface."""
    planted = (
        docs.orderBy("doc_id").limit(5)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
        .withColumn("text", F.concat("text", F.lit(" tail")))
    )
    corpus = docs.unionByName(planted)
    pairs = TX.minhash_lsh_pairs(corpus, jaccard_threshold=0.5, verify="estimate")
    assert pairs.columns == ["id_a", "id_b", "est_jaccard"]
    hits = pairs.filter("id_b - id_a = 500000").count()
    assert hits >= 4  # estimate is probabilistic; >=4/5 at j~0.95


def test_prefix_filter_order_equivalence(spark, docs):
    """Prefix-filter recall is guaranteed under ANY global order: frequency
    ordering (AllPairs) and plain hash ordering must emit identical pairs."""
    freq = TX.ngram_jaccard_pairs(docs, threshold=0.4).toPandas()
    hsh = TX.ngram_jaccard_pairs(docs, threshold=0.4, order_by="hash").toPandas()
    key = ["id_a", "id_b"]
    assert (
        freq.sort_values(key).reset_index(drop=True)
        .equals(hsh.sort_values(key).reset_index(drop=True))
    )
