"""Time travel + rollback on the snapshot chain."""

from __future__ import annotations

import pytest

import numpy as np

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from tests.conftest import assert_pdf_equal

pytestmark = pytest.mark.lake

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def state(t, version=None):
    df = t.scan() if version is None else t.scan_at(version)
    return df.orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)


def test_time_travel_and_rollback(spark, tmp_path):
    base = FX.make_transcripts(seed=61, n_convs=15, max_turns=5)
    events = FX.make_change_events(seed=62, n_events=600, n_convs=20, max_turns=5)
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    t.append(FX.table_rows_df(spark, base))
    v_seed = t.snapshot()["version"]
    seed_state = state(t)

    for i, ch in enumerate(np.array_split(events, 2)):
        merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)), epoch_id=i)
    v_after = t.snapshot()["version"]
    after_state = state(t)

    # time travel: the seed snapshot is still byte-readable
    assert_pdf_equal(state(t, v_seed), seed_state, KEY_COLS)

    # rollback to seed as a new commit; current state == seed state
    t.rollback(v_seed)
    assert t.snapshot()["version"] == v_after + 1
    assert_pdf_equal(state(t), seed_state, KEY_COLS)

    # fences survive rollback: replaying applied epochs is still a no-op
    r = merge_apply(
        t, FX.change_events_df(spark, events.iloc[:300].reset_index(drop=True)),
        epoch_id=0,
    )
    assert not r.applied
    assert_pdf_equal(state(t), seed_state, KEY_COLS)

    # rollback is itself undoable (roll forward to v_after)
    t.rollback(v_after)
    assert_pdf_equal(state(t), after_state, KEY_COLS)


def test_changes_between_cdf(spark, tmp_path):
    """Change-data-feed: the diff between two snapshots equals a brute-force
    comparison of the two time-travel states, classifies insert/update/
    delete, and scans only changed buckets."""
    import pandas as pd

    from battetl_spark import fixtures as FX
    from battetl_spark.cdc import merge_apply
    from battetl_spark.lake import LakeTable
    from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

    base = FX.make_transcripts(seed=51, n_convs=30, max_turns=6)
    ev = FX.make_change_events(seed=52, n_events=1500, n_convs=35, max_turns=6)
    t = LakeTable.create(spark, str(tmp_path / "cdf"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=8, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    t.append(FX.table_rows_df(spark, base))
    v0 = t.snapshot()["version"]
    merge_apply(t, FX.change_events_df(spark, ev), epoch_id=1)

    cdf = t.changes_between(v0).toPandas()
    assert set(cdf._change_type.unique()) <= {"insert", "update", "delete"}
    assert len(cdf) > 0

    old = t.scan_at(v0).toPandas().set_index(["conv_id", "turn_idx"])
    new = t.scan().toPandas().set_index(["conv_id", "turn_idx"])
    exp_ins = set(new.index) - set(old.index)
    exp_del = set(old.index) - set(new.index)
    both = set(new.index) & set(old.index)
    exp_upd = {k for k in both if new.loc[k, "_last_lsn"] > old.loc[k, "_last_lsn"]}

    got = cdf.set_index(["conv_id", "turn_idx"])
    assert set(got[got._change_type == "insert"].index) == exp_ins
    assert set(got[got._change_type == "update"].index) == exp_upd
    assert set(got[got._change_type == "delete"].index) == exp_del
    # delete rows surface the tombstone, not stale payload
    assert got[got._change_type == "delete"]["text"].isna().all()
    # v-to-same-v diff is empty
    v1 = t.snapshot()["version"]
    assert t.changes_between(v1, v1).count() == 0


def test_cdf_across_schema_evolution(spark, tmp_path):
    """changes_between across a snapshot boundary where a column was ADDED
    (round-2 verdict #7): diffing (v_before, v_after_evolution) must
    harmonize both sides to the current schema — change rows produced by
    old-schema events carry NULL in the added column, rows written by
    new-schema events carry the real value, and the insert/update/delete
    classification is unaffected."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = FX.make_transcripts(seed=81, n_convs=20, max_turns=5)
    ev = FX.make_change_events(seed=82, n_events=600, n_convs=25, max_turns=5)
    t = LakeTable.create(spark, str(tmp_path / "cdfe"), TRANSCRIPT_TABLE_SCHEMA,
                         num_buckets=4, key_cols=KEY_COLS, sort_cols=KEY_COLS)
    t.append(FX.table_rows_df(spark, base))
    v0 = t.snapshot()["version"]

    # epoch 0: old schema; epoch 1: adds a 'score' column (schema evolves)
    merge_apply(
        t, FX.change_events_df(spark, ev.iloc[:300].reset_index(drop=True)),
        epoch_id=0,
    )
    new_events = FX.change_events_df(
        spark, ev.iloc[300:].reset_index(drop=True)
    ).withColumn("score", (F.col("lsn") % 7).cast("double"))
    merge_apply(t, new_events, epoch_id=1)
    v2 = t.snapshot()["version"]
    assert "score" in [f.name for f in t.schema.fields]

    cdf = t.changes_between(v0, v2).toPandas()
    assert len(cdf) > 0 and "score" in cdf.columns
    new_lsns = set(ev.iloc[300:]["lsn"])
    live = cdf[cdf._change_type.isin(["insert", "update"])]
    assert len(live) > 0
    from_new = live[live._last_lsn.isin(new_lsns)]
    from_old = live[~live._last_lsn.isin(new_lsns)]
    assert len(from_new) > 0 and len(from_old) > 0  # both schemas represented
    # new-schema rows carry the real value; old-schema rows harmonize to NULL
    assert (from_new.score == from_new._last_lsn % 7).all()
    assert from_old.score.isna().all()

    # classification matches the brute-force state diff across the boundary
    old = t.scan_at(v0).toPandas().set_index(["conv_id", "turn_idx"])
    new = t.scan_at(v2).toPandas().set_index(["conv_id", "turn_idx"])
    got = cdf.set_index(["conv_id", "turn_idx"])
    assert set(got[got._change_type == "insert"].index) == (
        set(new.index) - set(old.index)
    )
    assert set(got[got._change_type == "delete"].index) == (
        set(old.index) - set(new.index)
    )
