"""Snapshot tags: named, vacuum-protected pins for reproducible datasets.

Iceberg-tag analog on the LakeTable root: ``tag(name)`` pins the current
version transactionally (metadata-only commit, manifests reused);
``scan_at(name)`` replays it byte-identically after any amount of later
ingest/compaction; ``vacuum_files`` retains tagged versions' metadata,
manifests and data files while dropping untagged history.
"""

from __future__ import annotations

import pandas as pd
import pytest

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

pytestmark = pytest.mark.lake

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def build(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
        num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )
    base = FX.make_transcripts(seed=3, n_convs=25, max_turns=5)
    t.append(FX.table_rows_df(spark, base))
    return t


def state(df):
    return df.toPandas()[ALL].sort_values(ALL[:2]).reset_index(drop=True)


def ingest(spark, t, seed, epoch):
    ev = FX.make_change_events(seed=seed, n_events=400, n_convs=30, max_turns=5)
    merge_apply(t, FX.change_events_df(spark, ev), epoch_id=epoch)


def test_tag_pins_state_across_later_ingest(spark, tmp_path):
    t = build(spark, tmp_path)
    ingest(spark, t, seed=21, epoch=1)
    pinned = state(t.scan())
    v = t.tag("train-v1")
    assert t.tags() == {"train-v1": v}
    ingest(spark, t, seed=22, epoch=2)
    ingest(spark, t, seed=23, epoch=3)
    assert not state(t.scan()).equals(pinned)  # table moved on
    pd.testing.assert_frame_equal(state(t.scan_at("train-v1")), pinned)
    # same-version re-tag is an idempotent no-op; moving needs replace=True
    assert t.tag("train-v1", version=v) == v
    with pytest.raises(ValueError):
        t.tag("train-v1")  # current version differs now
    v2 = t.tag("train-v1", replace=True)
    assert v2 > v and t.tags()["train-v1"] == v2


def test_vacuum_retains_tagged_version(spark, tmp_path):
    t = build(spark, tmp_path)
    ingest(spark, t, seed=31, epoch=1)
    pinned = state(t.scan())
    t.tag("pinned")
    # lots of churn so the tagged version falls far outside keep_snapshots
    for i in range(2, 8):
        ingest(spark, t, seed=30 + i, epoch=i)
    t.compact(min_files_per_bucket=1)
    deleted = t.vacuum_files(keep_snapshots=2)
    assert deleted  # untagged history actually went away
    pd.testing.assert_frame_equal(state(t.scan_at("pinned")), pinned)
    # drop the tag -> the version is vacuumable like any other
    t.delete_tag("pinned")
    assert t.tags() == {}
    t.vacuum_files(keep_snapshots=2)
    with pytest.raises(ValueError):
        t.snapshot_at("pinned")


def test_unknown_tag_and_missing_version(spark, tmp_path):
    t = build(spark, tmp_path)
    with pytest.raises(ValueError):
        t.scan_at("nope")
    with pytest.raises(ValueError):
        t.tag("x", version=99)
