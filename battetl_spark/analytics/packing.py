"""Sequence packing: concat-and-chunk documents into fixed-length training
sequences.

LLM pre-training consumes fixed ``seq_len``-token sequences; the standard
"concat and chunk" packer shuffles the corpus deterministically,
concatenates token streams in that order, and cuts every ``seq_len``
tokens — a document crossing a boundary contributes a span to each side.
This operator emits the pack PLAN — one row per (chunk, document-span):

    (chunk_id, doc_id, start_in_doc, start_in_chunk, n_toks)

so chunk materialization is a later join against the tokenized text;
the pack decision itself never moves document bytes.

Determinism and scale:

- the global order is ``(md5-hash(seed|id), id)`` — the same deterministic
  52-bit integer the sampling operators use (analytics/sampling.py), so
  the pack layout is identical on any cluster size, partitioning, or
  retry, and DuckDB reproduces it exactly (the oracle);
- the global running token-offset is a distributed two-pass prefix sum,
  NOT a single-partition window: rows range-shard by the hash key's high
  bits (map-only, order-preserving because shard is monotone in the key),
  each shard cumulates locally under one window Exchange, per-shard totals
  (#shards rows, map-side partial agg) cumulate in a trivially small
  window and broadcast back as base offsets. Nothing serial ever sees
  O(corpus) rows;
- only a SKINNY (id, key, tokens) frame enters the shuffle — column
  pruning keeps text out of the scan of the offsets branch entirely when
  ``tokens_col`` is precomputed, and out of every Exchange always;
- span explosion is ``sequence(first_chunk, last_chunk)`` — linear,
  map-side, and a giant document simply yields more spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from battetl_spark.analytics.sampling import sample_uniform  # noqa: F401
from battetl_spark.analytics.textops import token_count

_KEY_BITS = 52  # md5-prefix bits, matches sampling.sample_uniform


def shuffle_key(id_col, seed: int = 0):
    """Deterministic 52-bit integer shuffle key from an id column — the
    integer numerator of ``sample_uniform`` (same md5 prefix), kept as a
    BIGINT so ordering and sharding stay exact-integer in every engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat_ws("|", F.lit(str(int(seed))), c.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long")


def pack_documents(
    docs: DataFrame,
    seq_len: int,
    *,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    num_shards: int | None = None,
) -> DataFrame:
    """Pack the corpus into ``seq_len``-token chunks; returns the span plan
    ``(chunk_id, doc_id, start_in_doc, start_in_chunk, n_toks)``.

    ``tokens_col`` supplies a precomputed per-document token count
    (otherwise whitespace ``token_count(text_col)`` — the engine's standard
    proxy). Rows with NULL or non-positive counts are excluded.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = docs.sparkSession
    shards = num_shards or max(1, spark.sparkContext.defaultParallelism * 4)
    shard_div = -(-(1 << _KEY_BITS) // shards)  # ceil → shard id < shards

    toks = (
        F.col(tokens_col) if tokens_col else token_count(text_col)
    ).cast("long")
    key = shuffle_key(id_col, seed)
    skinny = (
        docs.select(F.col(id_col), key.alias("__k"), toks.alias("__toks"))
        .filter(F.col("__toks") > 0)
        # integer div, not floor(double /): a double quotient can round up
        # across a shard boundary for keys near 2^52
        .withColumn("__shard", F.expr(f"__k div {shard_div}"))
    )

    # pass 1: per-shard totals — map-side partial aggregation, #shards rows
    totals = skinny.groupBy("__shard").agg(F.sum("__toks").alias("__t"))
    # exclusive prefix over #shards rows: the only single-partition window,
    # and it sees exactly `shards` rows, never corpus rows
    w_tiny = Window.orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = totals.select(
        "__shard", F.coalesce(F.sum("__t").over(w_tiny), F.lit(0)).alias("__base")
    )

    # pass 2: local cumulative inside each shard (ONE corpus-side Exchange;
    # shard is monotone in __k, so shard-major (key, id) order == the
    # global (key, id) order the oracle uses)
    w_local = Window.partitionBy("__shard").orderBy("__k", id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        skinny.withColumn(
            "__local", F.coalesce(F.sum("__toks").over(w_local), F.lit(0))
        )
        .join(F.broadcast(bases), "__shard")
        .select(
            id_col,
            F.col("__toks").alias("__n"),
            (F.col("__base") + F.col("__local")).alias("__off"),
        )
    )

    L = F.lit(int(seq_len))
    first = F.expr(f"__off div {int(seq_len)}")
    last = F.expr(f"(__off + __n - 1) div {int(seq_len)}")
    spans = offs.select(
        F.col(id_col),
        "__n",
        "__off",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    c_lo = F.col("chunk_id") * L
    c_hi = c_lo + L
    return spans.select(
        "chunk_id",
        F.col(id_col),
        F.greatest(F.lit(0), c_lo - F.col("__off")).alias("start_in_doc"),
        F.greatest(F.lit(0), F.col("__off") - c_lo).alias("start_in_chunk"),
        (
            F.least(c_hi, F.col("__off") + F.col("__n"))
            - F.greatest(c_lo, F.col("__off"))
        ).alias("n_toks"),
    )


def materialize_chunks(
    docs: DataFrame,
    plan: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble the packed sequences a ``pack_documents`` plan describes:
    ``(chunk_id, n_toks, tokens array<string>)``.

    This is the byte-moving half of packing, deliberately separate from the
    plan: one equi-join ``plan ⋈ docs`` on the id (each side one shuffle —
    Catalyst picks sort-merge for two large sides, broadcast when the plan
    is small), per-span token slices map-side, then ONE groupBy(chunk_id)
    that moves exactly ``seq_len`` tokens per output chunk. Span order
    inside a chunk is restored with ``array_sort`` over (start_in_chunk,
    piece) structs — no window, no second shuffle.

    Only valid for plans built with the DEFAULT whitespace token counts:
    this function re-tokenizes by whitespace, so a plan produced with a
    custom ``tokens_col`` would mis-align the slices with the counted
    tokens (round-6 advice note — pass the same custom tokenization here
    if you ever add one, and assert per-doc counts match the plan's).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pieces = plan.join(
        docs.select(F.col(id_col), toks.alias("__toks")), id_col
    ).select(
        "chunk_id",
        "n_toks",
        F.slice(
            F.col("__toks"),
            (F.col("start_in_doc") + 1).cast("int"),
            F.col("n_toks").cast("int"),
        ).alias("__piece"),
        "start_in_chunk",
    )
    return pieces.groupBy("chunk_id").agg(
        F.sum("n_toks").alias("n_toks"),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("start_in_chunk", "__piece"))
                ),
                lambda s: s["__piece"],
            )
        ).alias("tokens"),
    )
