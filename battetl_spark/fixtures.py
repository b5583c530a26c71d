"""Deterministic synthetic fixtures + pandas oracle replay (FIXTURES.md F1-F3).

Mirrors the reference's golden-pickle test strategy
(reference tests/conftest.py:68-386 — pinned inputs + hand-checkable expected
frames): same seed ⇒ identical bytes, no wall-clock, no unseeded randomness.

Two generator families:
- pandas generators (``make_transcripts`` / ``make_change_events``) — test
  scale (10^3..10^5 rows), feed ``spark.createDataFrame`` and the pure-pandas
  oracle replay.
- a Spark-native generator (``spark_change_events``) — bench scale (10^6+),
  fully distributed, deterministic via xxhash64(id, seed); no driver material.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from battetl_spark.schemas import (
    CHANGE_EVENT_SCHEMA,
    KEY_COLS,
    LAST_LSN_COL,
    TRANSCRIPT_SCHEMA,
    TRANSCRIPT_TABLE_SCHEMA,
)

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "code", "browser"]
_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu"
).split()
BASE_EPOCH = np.datetime64("2026-01-01T00:00:00")


def _words(rng: np.random.Generator, n_rows: int, n_words: int = 6) -> np.ndarray:
    idx = rng.integers(0, len(_VOCAB), size=(n_rows, n_words))
    vocab = np.array(_VOCAB)
    return np.array([" ".join(vocab[r]) for r in idx])


def make_transcripts(
    seed: int = 42, n_convs: int = 1000, max_turns: int = 50
) -> pd.DataFrame:
    """F1 base transcript table; ~(max_turns/2) turns per conv, seeded."""
    rng = np.random.default_rng(seed)
    turns = rng.integers(1, max_turns + 1, size=n_convs)
    conv_ids = np.repeat(
        np.array([f"conv-{i:06d}" for i in range(n_convs)]), turns
    )
    conv_nums = np.repeat(np.arange(n_convs), turns)
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int32)
    n = len(conv_ids)
    roles = np.array(ROLES)[rng.integers(0, len(ROLES), n)]
    tool_mask = rng.random(n) < 0.2
    tools = np.where(tool_mask, np.array(TOOLS)[rng.integers(0, len(TOOLS), n)], None)
    body = _words(rng, n)
    text = np.array(
        [f"{c}/{t}/v0:{w}" for c, t, w in zip(conv_ids, turn_idx, body)]
    )
    ts = BASE_EPOCH + (conv_nums.astype("int64") * 9973 + turn_idx * 37).astype(
        "timedelta64[s]"
    )
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tools,
            "ts": ts,
        }
    )


def make_change_events(
    seed: int = 42,
    n_events: int = 100_000,
    n_convs: int = 1000,
    max_turns: int = 50,
    zipf_s: float = 1.2,
    dup_rate: float = 0.02,
    shuffle_window: int = 100,
    op_ratio: tuple[float, float, float] = (0.70, 0.25, 0.05),
    n_source_partitions: int = 8,
) -> pd.DataFrame:
    """F2 ordered CDC log with skew, duplicates, and out-of-order arrival.

    lsn is the global ordering authority (strictly increasing before
    perturbation). Duplicates re-emit identical (lsn, payload) rows
    (at-least-once delivery); out-of-order shuffles rows within a window of
    ``shuffle_window`` positions — lsn still defines the true order.
    """
    rng = np.random.default_rng(seed)
    n = n_events
    # Zipf-ranked conversation popularity: rank r gets mass ~ r^-s.
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()
    conv_nums = rng.choice(n_convs, size=n, p=probs)
    conv_ids = np.array([f"conv-{i:06d}" for i in conv_nums])
    turn_idx = rng.integers(0, max_turns, size=n).astype(np.int32)

    u = rng.random(n)
    i_cut, u_cut = op_ratio[0], op_ratio[0] + op_ratio[1]
    op = np.where(u < i_cut, "i", np.where(u < u_cut, "u", "d"))

    lsn = np.arange(1, n + 1, dtype=np.int64)
    # version = how many prior events touched this key (for text traceability)
    key_codes = conv_nums.astype(np.int64) * max_turns + turn_idx
    version = (
        pd.Series(np.ones(n)).groupby(key_codes).cumcount().to_numpy().astype(np.int64)
    )
    roles = np.array(ROLES)[rng.integers(0, len(ROLES), n)]
    tool_mask = rng.random(n) < 0.2
    tools = np.where(tool_mask, np.array(TOOLS)[rng.integers(0, len(TOOLS), n)], None)
    body = _words(rng, n)
    text = np.array(
        [
            f"{c}/{t}/v{v}:{w}"
            for c, t, v, w in zip(conv_ids, turn_idx, version, body)
        ]
    )
    ts = BASE_EPOCH + (lsn + 10_000_000).astype("timedelta64[s]")
    src = (lsn % n_source_partitions).astype(np.int32)

    pdf = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tools,
            "ts": ts,
            "source_partition": src,
        }
    )
    # duplicates: re-emit ~dup_rate of rows verbatim
    if dup_rate > 0:
        dup_idx = rng.random(n) < dup_rate
        pdf = pd.concat([pdf, pdf[dup_idx]], ignore_index=True)
    # out-of-order: stable sort by (position + U[0, window)) — bounded disorder
    if shuffle_window > 1:
        jitter = rng.random(len(pdf)) * shuffle_window
        order = np.argsort(np.arange(len(pdf)) + jitter, kind="stable")
        pdf = pdf.iloc[order].reset_index(drop=True)
    return pdf


def transcripts_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def table_rows_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Base transcripts as stored-table rows (seed _last_lsn = 0)."""
    pdf = pdf.copy()
    pdf[LAST_LSN_COL] = np.int64(0)
    pdf["_deleted"] = False
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_TABLE_SCHEMA)


def change_events_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    cols = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], schema=CHANGE_EVENT_SCHEMA)


def pandas_oracle_replay(
    base: pd.DataFrame | None, events: pd.DataFrame
) -> pd.DataFrame:
    """F3 golden oracle: single-threaded replay, sort by lsn, apply ops,
    last-writer-wins; returns final table state sorted by (conv_id, turn_idx)
    including the _last_lsn bookkeeping column.

    Semantics (must match the engine exactly):
    - events applied in strictly increasing lsn order; duplicate lsn for the
      same key applies once (identical payload);
    - an event with lsn <= the key's applied _last_lsn is a no-op (late);
    - op 'i' and 'u' both upsert (LWW); 'd' removes the key if present.
    """
    state: dict[tuple[str, int], dict] = {}
    if base is not None:
        for row in base.itertuples(index=False):
            state[(row.conv_id, int(row.turn_idx))] = {
                "role": row.role,
                "text": row.text,
                "tool": row.tool,
                "ts": row.ts,
                LAST_LSN_COL: 0,
            }
    ev = events.sort_values("lsn", kind="stable")
    for row in ev.itertuples(index=False):
        key = (row.conv_id, int(row.turn_idx))
        prev = state.get(key)
        if prev is not None and int(row.lsn) <= prev[LAST_LSN_COL]:
            continue
        if row.op == "d":
            state.pop(key, None)
            continue
        state[key] = {
            "role": row.role,
            "text": row.text,
            "tool": row.tool,
            "ts": row.ts,
            LAST_LSN_COL: int(row.lsn),
        }
    out = pd.DataFrame(
        [
            {
                "conv_id": k[0],
                "turn_idx": np.int32(k[1]),
                **v,
            }
            for k, v in state.items()
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", LAST_LSN_COL],
    )
    out[LAST_LSN_COL] = out[LAST_LSN_COL].astype(np.int64)
    if len(out):
        out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return out.sort_values(KEY_COLS, kind="stable").reset_index(drop=True)


def spark_change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 10_000,
    max_turns: int = 50,
    seed: int = 42,
    skew_alpha: float = 3.0,
    n_source_partitions: int = 32,
) -> DataFrame:
    """Bench-scale distributed generator: deterministic per-id via xxhash64.

    Power-law conversation skew: conv = floor(n_convs * u^alpha); alpha=3 puts
    ~58%% of events on the first 10%% of conversations (hot-key regime, the
    driver's Zipf hint). No data ever materializes on the driver — this is the
    pattern that generates 10^10 events on a cluster.
    """

    def u(col_salt: int):
        h = F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(col_salt)))
        return (h % 1_000_000_007).cast("double") / 1_000_000_007.0

    df = spark.range(0, n_events, 1)
    conv_num = F.floor(F.lit(float(n_convs)) * F.pow(u(1), F.lit(skew_alpha))).cast(
        "long"
    )
    op_u = u(2)
    return df.select(
        (F.col("id") + 1).alias("lsn"),
        F.when(op_u < 0.70, "i").when(op_u < 0.95, "u").otherwise("d").alias("op"),
        F.format_string("conv-%06d", conv_num).alias("conv_id"),
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(3))) % max_turns)
        .cast("int")
        .alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in ROLES]),
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(4))) % 4 + 1).cast("int"),
        ).alias("role"),
        F.concat(
            F.format_string("conv-%06d", conv_num),
            F.lit("/"),
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(3))) % max_turns).cast(
                "string"
            ),
            F.lit("/L"),
            (F.col("id") + 1).cast("string"),
            F.lit(":"),
            F.repeat(F.lit("lorem ipsum dolor sit amet "), 4),
        ).alias("text"),
        F.when(
            u(5) < 0.2,
            F.element_at(
                F.array(*[F.lit(t) for t in TOOLS]),
                (F.abs(F.xxhash64("id", F.lit(seed), F.lit(6))) % 3 + 1).cast("int"),
            ),
        ).alias("tool"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("id"))
        .cast("timestamp_ntz")
        .alias("ts"),
        (F.col("id") % n_source_partitions).cast("int").alias("source_partition"),
    )
