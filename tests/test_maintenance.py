"""Table maintenance: compaction, tombstone vacuum, file GC."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from tests.conftest import assert_pdf_equal

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def build(spark, tmp_path, n_batches=4):
    base = FX.make_transcripts(seed=11, n_convs=30, max_turns=6)
    events = FX.make_change_events(seed=12, n_events=1500, n_convs=40, max_turns=6)
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    t.append(FX.table_rows_df(spark, base))
    for i, ch in enumerate(np.array_split(events, n_batches)):
        merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)), epoch_id=i)
    return t, FX.pandas_oracle_replay(base, events)


def state(t):
    return t.scan().orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)


def test_compact_preserves_state(spark, tmp_path):
    t, expected = build(spark, tmp_path)
    before_files = sum(len(v) for v in t.snapshot()["files"].values())
    snap = t.compact(min_files_per_bucket=2)
    assert snap is not None
    after_files = sum(len(v) for v in t.snapshot()["files"].values())
    assert after_files < before_files
    assert_pdf_equal(state(t), expected, KEY_COLS)


def test_vacuum_tombstones_keeps_live_rows_and_fencing(spark, tmp_path):
    t, expected = build(spark, tmp_path)
    dead_before = t.scan(include_deleted=True).filter("_deleted").count()
    assert dead_before > 0
    t.vacuum_tombstones(below_lsn=10_000)  # horizon beyond all lsns
    assert t.scan(include_deleted=True).filter("_deleted").count() == 0
    assert_pdf_equal(state(t), expected, KEY_COLS)


def test_vacuum_files_removes_unreferenced(spark, tmp_path):
    t, expected = build(spark, tmp_path)
    t.compact(min_files_per_bucket=2)
    all_files = glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"),
                          recursive=True)
    deleted = t.vacuum_files(keep_snapshots=1)
    assert deleted and len(deleted) < len(all_files)
    assert all(not os.path.exists(p) for p in deleted)
    assert_pdf_equal(state(t), expected, KEY_COLS)  # current snapshot intact


def test_vacuum_reclaims_fence_noop_orphans(spark, tmp_path):
    """A fenced replay writes data files then discards the commit (no
    snapshot references them); vacuum_files must reclaim those orphans while
    every referenced file — and the table state — survives."""
    import glob
    import os

    from battetl_spark import fixtures as FX
    from battetl_spark.cdc import merge_apply
    from battetl_spark.lake import LakeTable
    from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    ev = FX.change_events_df(
        spark, FX.make_change_events(seed=31, n_events=500, n_convs=20, max_turns=5)
    )
    assert merge_apply(t, ev, epoch_id=1).applied
    before_files = set(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                                 recursive=True))
    before_state = t.scan().orderBy(*KEY_COLS).toPandas()

    # replay through the top-of-function check writes nothing...
    assert not merge_apply(t, ev, epoch_id=1).applied
    # ...but the fence-RACE path (fence appears after the check) has already
    # written its data when the commit is discarded — simulate it directly
    from battetl_spark.lake.table import BUCKET_COL, bucket_expr

    snap = t.snapshot()
    b0 = [int(next(iter(snap["files"])))]
    rows = t.scan(b0, snap, include_deleted=True).withColumn(
        BUCKET_COL, bucket_expr(snap["bucket_key"], snap["num_buckets"])
    )
    assert t.replace_buckets(
        rows, b0, fence={"epoch_id": 1, "max_lsn": 0}, base_snapshot=snap
    ) is None
    after_files = set(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                                recursive=True))
    orphans = after_files - before_files
    assert orphans  # the discarded write left files behind

    deleted = set(t.vacuum_files(keep_snapshots=10))
    assert orphans <= deleted  # every orphan reclaimed
    assert t.scan().orderBy(*KEY_COLS).toPandas().equals(before_state)
