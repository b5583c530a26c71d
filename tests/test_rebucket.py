"""rebucket(): power-of-two bucket-count growth (round-3 verdict task #3).

The split must preserve state byte-for-byte, keep pruning exact under the
new bucket count, fold MOR deltas, carry fences, run shuffle-free, and be
conflict-detected against concurrent commits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.lake.table import BUCKET_COL, CommitConflict, bucket_expr
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from tests.conftest import assert_pdf_equal

pytestmark = pytest.mark.lake

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def build(spark, tmp_path, num_buckets=8, n_batches=3):
    base = FX.make_transcripts(seed=61, n_convs=40, max_turns=6)
    events = FX.make_change_events(seed=62, n_events=1500, n_convs=50, max_turns=6)
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=num_buckets, key_cols=KEY_COLS,
                         sort_cols=KEY_COLS)
    t.append(FX.table_rows_df(spark, base))
    for i, ch in enumerate(np.array_split(events, n_batches)):
        merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)),
                    epoch_id=i)
    return t, FX.pandas_oracle_replay(base, events)


def state(t):
    return t.scan().orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)


def test_rebucket_preserves_state_and_pruning(spark, tmp_path):
    t, expected = build(spark, tmp_path, num_buckets=8)
    v_before = t.snapshot()["version"]
    snap = t.rebucket(32)
    assert snap["num_buckets"] == 32
    assert_pdf_equal(state(t), expected, KEY_COLS)

    # pruning exactness: every row scanned from bucket b hashes to b under
    # the NEW count, and a per-key bucket probe finds the key
    mism = (
        t.scan(buckets=list(range(32)))
        .withColumn("b", bucket_expr("conv_id", 32))
    )
    per_bucket = {
        int(r["b"]) for r in mism.select("b").distinct().collect()
    }
    for b in sorted(per_bucket)[:4]:
        rows = t.scan(buckets=[b]).withColumn("chk", bucket_expr("conv_id", 32))
        assert rows.filter(F.col("chk") != b).count() == 0
        assert rows.count() > 0

    # CDF across the rebucket reports NO spurious changes (row versions
    # untouched), while CDF from before the last merge still sees real ones
    assert t.changes_between(v_before).count() == 0

    # a merge AFTER the rebucket lands correctly under the new layout
    key = t.scan().limit(1).select("conv_id", "turn_idx").first()
    max_lsn = int(t.scan().agg(F.max("_last_lsn")).first()[0])
    upd = pd.DataFrame([{
        "lsn": max_lsn + 1, "op": "u", "conv_id": key["conv_id"],
        "turn_idx": np.int32(key["turn_idx"]), "role": "user",
        "text": "post-rebucket", "tool": None,
        "ts": pd.Timestamp("2026-08-01"), "source_partition": np.int32(0),
    }])
    assert merge_apply(t, FX.change_events_df(spark, upd), epoch_id=99).applied
    child = t.scan().filter(
        (F.col("conv_id") == key["conv_id"])
        & (F.col("turn_idx") == key["turn_idx"])
    )
    assert child.first()["text"] == "post-rebucket"


def test_rebucket_rejects_bad_factors(spark, tmp_path):
    t, _ = build(spark, tmp_path, num_buckets=8, n_batches=1)
    for bad in (8, 4, 12, 24, 17):
        with pytest.raises(ValueError):
            t.rebucket(bad)


def test_rebucket_folds_mor_deltas_and_keeps_fences(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    ev = FX.make_change_events(seed=63, n_events=800, n_convs=30, max_turns=5)
    halves = np.array_split(ev, 2)
    assert merge_apply(t, FX.change_events_df(spark, halves[0].reset_index(drop=True)),
                       epoch_id=0).applied
    assert merge_apply(t, FX.change_events_df(spark, halves[1].reset_index(drop=True)),
                       epoch_id=1, mode="mor").applied
    assert any(
        e.get("delta") for entries in t.snapshot()["files"].values()
        for e in entries
    )
    expected = state(t)

    t.rebucket(16)
    snap = t.snapshot()
    assert snap["num_buckets"] == 16
    assert not any(
        e.get("delta") for entries in snap["files"].values() for e in entries
    )
    pd.testing.assert_frame_equal(state(t), expected)

    # fences carried: both epochs replay as no-ops
    assert t.has_fence(0) and t.has_fence(1)
    assert not merge_apply(
        t, FX.change_events_df(spark, halves[0].reset_index(drop=True)), epoch_id=0
    ).applied
    # deltas folded → plain append is legal again
    t.append(FX.table_rows_df(spark, FX.make_transcripts(seed=64, n_convs=2,
                                                         max_turns=2)))


def test_rebucket_conflicts_with_concurrent_commit(spark, tmp_path):
    t, _ = build(spark, tmp_path, num_buckets=4, n_batches=1)
    orig = t._write_data
    fired = {"done": False}

    def race(df, *a, **k):
        out = orig(df, *a, **k)
        if not fired["done"]:
            fired["done"] = True  # guard: the racing append recurses here
            other = LakeTable.load(t.spark, t.path)
            other.append(FX.table_rows_df(
                t.spark, FX.make_transcripts(seed=65, n_convs=2, max_turns=2)
            ))
        return out

    t._write_data = race
    try:
        with pytest.raises(CommitConflict):
            t.rebucket(8)
    finally:
        t._write_data = orig
    # the losing rebucket committed nothing: bucket count unchanged and the
    # racing append's rows are intact
    assert t.snapshot()["num_buckets"] == 4


def test_rebucket_plan_no_shuffle(spark, tmp_path):
    """The rewrite pass must not shuffle: child bucket is a refinement of
    the parent each task read, so the write plan (scan → bucket expr →
    sortWithinPartitions → partitionBy) contains no Exchange."""
    t, _ = build(spark, tmp_path, num_buckets=4, n_batches=1)
    captured = {}
    orig = t._write_data

    def capture(df, *a, **k):
        captured["shuffle"] = k.get("shuffle", True)
        captured["plan"] = (
            df.sortWithinPartitions(BUCKET_COL, *KEY_COLS)
            ._jdf.queryExecution().executedPlan().toString()
        )
        return orig(df, *a, **k)

    t._write_data = capture
    try:
        t.rebucket(8)
    finally:
        t._write_data = orig
    assert captured["shuffle"] is False
    assert "Exchange" not in captured["plan"]
