"""Bulk predicate DELETE routed through the CDC merge path.

``delete_where`` synthesizes tombstone events for live rows matching a
zone-map filter / Column predicate, so every merge invariant (LWW,
tombstone fencing, epoch fences, lineage) applies unchanged. These tests
pin: exact row removal, snapshot-conditional LSN semantics (default
``row._last_lsn + 1``: ties keep the tombstone, newer lsns resurrect),
fixed-lsn mode skipping newer rows, and epoch-fence idempotence.
"""

from __future__ import annotations

import pytest

from battetl_spark import fixtures as FX
from battetl_spark.cdc import delete_where, merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

from pyspark.sql import functions as F

pytestmark = pytest.mark.merge


def build(spark, tmp_path):
    base = FX.make_transcripts(seed=7, n_convs=20, max_turns=6)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
        num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )
    t.append(FX.table_rows_df(spark, base))  # all rows at _last_lsn = 0
    return t, base


def keys(df):
    return {(r["conv_id"], r["turn_idx"]) for r in df.select(*KEY_COLS).collect()}


def test_delete_where_filters_and_tombstones(spark, tmp_path):
    t, base = build(spark, tmp_path)
    victims = {
        (r.conv_id, r.turn_idx)
        for r in base.itertuples() if r.turn_idx >= 4
    }
    res = delete_where(t, filters=[("turn_idx", ">=", 4)], epoch_id=1)
    assert res.applied and res.rows_deleted == len(victims)
    live = keys(t.scan())
    assert live == {(r.conv_id, r.turn_idx) for r in base.itertuples()} - victims
    # tombstones exist (fencing state), not silently dropped rows
    dead = t.scan(include_deleted=True).filter(F.col("_deleted"))
    assert keys(dead) == victims
    # epoch fence: replaying the same delete epoch is a no-op
    res2 = delete_where(t, filters=[("turn_idx", ">=", 4)], epoch_id=1)
    assert not res2.applied
    assert keys(t.scan()) == live


def test_delete_where_snapshot_conditional_lsn(spark, tmp_path):
    t, base = build(spark, tmp_path)
    victim = base.iloc[0]
    key = (victim.conv_id, int(victim.turn_idx))
    delete_where(
        t,
        predicate=(F.col("conv_id") == key[0]) & (F.col("turn_idx") == key[1]),
        epoch_id=1,
    )
    assert key not in keys(t.scan())
    # late update at the tombstone's OWN lsn (row was 0, tombstone at 1):
    # lsn ties resolve to the current row -> stays deleted
    import pandas as pd

    def ev(lsn):
        return FX.change_events_df(spark, pd.DataFrame([{
            "lsn": lsn, "op": "u", "conv_id": key[0], "turn_idx": key[1],
            "role": "user", "text": "resurrect", "tool": None,
            "ts": pd.Timestamp("2026-01-01"), "source_partition": 0,
        }]))

    merge_apply(t, ev(1), epoch_id=2)
    assert key not in keys(t.scan())
    # a genuinely newer event resurrects the row (CDC-correct, no lost update)
    merge_apply(t, ev(2), epoch_id=3)
    assert key in keys(t.scan())


def test_delete_where_fixed_lsn_respects_lww(spark, tmp_path):
    t, base = build(spark, tmp_path)
    # bump one matching row to lsn 10 first
    import pandas as pd

    hot = base.iloc[1]
    hot_key = (hot.conv_id, int(hot.turn_idx))
    merge_apply(t, FX.change_events_df(spark, pd.DataFrame([{
        "lsn": 10, "op": "u", "conv_id": hot_key[0], "turn_idx": hot_key[1],
        "role": "user", "text": "fresh", "tool": None,
        "ts": pd.Timestamp("2026-01-01"), "source_partition": 0,
    }])), epoch_id=1)
    before = keys(t.scan())
    delete_where(t, lsn=5, epoch_id=2)  # everything at lsn 0 dies; lsn 10 row survives
    after = keys(t.scan())
    assert after == {hot_key}
    assert hot_key in before
