"""Merge-on-read mode: delta-file appends + read-time LWW resolve.

Pins the MOR contract: replay state equals the CoW replay and the pandas
oracle; ingest never rewrites existing files (write cost ∝ batch);
compaction folds deltas back to base with no state change; fences stay
exactly-once; late events lose at read time; mixing modes converges."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

import pytest

pytestmark = pytest.mark.merge

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def fresh(spark, path, base_pdf=None):
    t = LakeTable.create(spark, path, TRANSCRIPT_TABLE_SCHEMA, num_buckets=8,
                         key_cols=KEY_COLS, sort_cols=KEY_COLS)
    if base_pdf is not None:
        t.append(FX.table_rows_df(spark, base_pdf))
    return t


def state(t):
    return t.scan().orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)


def replay(spark, t, events, n_batches=4, mode="mor"):
    for i, ch in enumerate(np.array_split(events, n_batches)):
        r = merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)),
                        epoch_id=i, mode=mode)
        assert r.applied
    return t


def test_mor_replay_equals_cow_and_oracle(spark, tmp_path):
    base = FX.make_transcripts(seed=91, n_convs=30, max_turns=6)
    ev = FX.make_change_events(seed=92, n_events=2000, n_convs=40, max_turns=6,
                               dup_rate=0.03)
    t_mor = replay(spark, fresh(spark, str(tmp_path / "mor"), base), ev)
    t_cow = replay(spark, fresh(spark, str(tmp_path / "cow"), base), ev, mode="cow")
    expected = FX.pandas_oracle_replay(base, ev)[ALL].reset_index(drop=True)
    pd.testing.assert_frame_equal(state(t_mor), expected, check_dtype=False)
    pd.testing.assert_frame_equal(state(t_mor), state(t_cow), check_dtype=False)
    # delta entries actually exist pre-compaction
    snap = t_mor.snapshot()
    assert any(
        e.get("delta") for entries in snap["files"].values() for e in entries
    )


def test_mor_never_rewrites_existing_files(spark, tmp_path):
    """The ingest-side claim: each MOR commit only ADDS files — every
    pre-existing file entry survives untouched (write ∝ batch bytes)."""
    base = FX.make_transcripts(seed=93, n_convs=30, max_turns=6)
    ev = FX.make_change_events(seed=94, n_events=1500, n_convs=40, max_turns=6)
    t = fresh(spark, str(tmp_path / "t"), base)
    for i, ch in enumerate(np.array_split(ev, 3)):
        before = {
            b: [e["path"] for e in entries]
            for b, entries in t.snapshot()["files"].items()
        }
        merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)),
                    epoch_id=i, mode="mor")
        after = {
            b: [e["path"] for e in entries]
            for b, entries in t.snapshot()["files"].items()
        }
        for b, paths in before.items():
            assert after[b][: len(paths)] == paths, "MOR rewrote existing files"


def test_mor_compaction_folds_deltas(spark, tmp_path):
    base = FX.make_transcripts(seed=95, n_convs=30, max_turns=6)
    ev = FX.make_change_events(seed=96, n_events=1500, n_convs=40, max_turns=6)
    t = replay(spark, fresh(spark, str(tmp_path / "t"), base), ev)
    before = state(t)
    assert t.compact(min_files_per_bucket=1) is not None
    snap = t.snapshot()
    assert not any(
        e.get("delta") for entries in snap["files"].values() for e in entries
    ), "compaction left delta files"
    pd.testing.assert_frame_equal(state(t), before)
    # post-fold scans are back on the resolve-free fast path and still exact
    assert t.scan(include_deleted=True).count() >= t.scan().count()


def test_mor_fence_replay_and_late_events(spark, tmp_path):
    base = FX.make_transcripts(seed=97, n_convs=20, max_turns=5)
    ev = FX.make_change_events(seed=98, n_events=800, n_convs=25, max_turns=5)
    t = replay(spark, fresh(spark, str(tmp_path / "t"), base), ev, n_batches=2)
    v = t.snapshot()["version"]
    s0 = state(t)
    # replayed epoch: fence no-op, nothing appended
    r = merge_apply(
        t, FX.change_events_df(spark, ev.iloc[: len(ev) // 2]), epoch_id=0,
        mode="mor",
    )
    assert not r.applied and t.snapshot()["version"] == v
    # a LATE event (lsn below the key's applied lsn) lands in a delta file
    # but LOSES at read time
    live = t.scan().limit(1).collect()[0]
    late = pd.DataFrame(
        {
            "lsn": [1],  # far below any applied lsn for this key
            "op": ["u"],
            "conv_id": [live["conv_id"]],
            "turn_idx": [np.int32(live["turn_idx"])],
            "role": ["late-role"],
            "text": ["LATE"],
            "tool": [None],
            "ts": [pd.Timestamp("2026-01-01")],
            "source_partition": [np.int32(0)],
        }
    )
    r = merge_apply(t, FX.change_events_df(spark, late), epoch_id=50, mode="mor")
    assert r.applied
    got = (
        t.scan()
        .filter(
            f"conv_id = '{live['conv_id']}' and turn_idx = {live['turn_idx']}"
        )
        .collect()[0]
    )
    assert got["text"] == live["text"] and got["_last_lsn"] == live["_last_lsn"]
    pd.testing.assert_frame_equal(state(t), s0)  # no visible change


def test_mor_then_cow_converges(spark, tmp_path):
    """A CoW merge over a delta-bearing table resolves against the MOR state
    and its bucket rewrite folds those buckets' deltas."""
    base = FX.make_transcripts(seed=99, n_convs=25, max_turns=5)
    ev = FX.make_change_events(seed=100, n_events=1200, n_convs=30, max_turns=5)
    half = len(ev) // 2
    t = fresh(spark, str(tmp_path / "t"), base)
    merge_apply(t, FX.change_events_df(spark, ev.iloc[:half]), epoch_id=0,
                mode="mor")
    merge_apply(
        t, FX.change_events_df(spark, ev.iloc[half:].reset_index(drop=True)),
        epoch_id=1, mode="cow",
    )
    expected = FX.pandas_oracle_replay(base, ev)[ALL].reset_index(drop=True)
    pd.testing.assert_frame_equal(state(t), expected, check_dtype=False)


def _one_event(key, lsn, text):
    return pd.DataFrame(
        {
            "lsn": [lsn],
            "op": ["u"],
            "conv_id": [key],
            "turn_idx": [np.int32(0)],
            "role": ["user"],
            "text": [text],
            "tool": [None],
            "ts": [pd.Timestamp("2026-01-01")],
            "source_partition": [np.int32(0)],
        }
    )


def test_mor_delta_tie_first_commit_wins(spark, tmp_path):
    """Two delta commits carrying the SAME lsn for a key (cross-epoch
    redelivery or colliding writers): the FIRST-applied commit must win
    deterministically — same invariant as CoW's current-row-wins tie rule,
    pinned via the per-commit seq tag (a bare max_by would pick an
    arbitrary winner per scan)."""
    import pytest

    t = fresh(spark, str(tmp_path / "t"))
    merge_apply(t, FX.change_events_df(spark, _one_event("K", 100, "first")),
                epoch_id=0, mode="mor")
    merge_apply(t, FX.change_events_df(spark, _one_event("K", 100, "second")),
                epoch_id=1, mode="mor")
    for _ in range(3):  # deterministic across repeated scans
        assert t.scan().collect()[0]["text"] == "first"
    t.compact(min_files_per_bucket=1)
    assert t.scan().collect()[0]["text"] == "first"
    # and a delta tying an already-compacted BASE row is a no-op too
    merge_apply(t, FX.change_events_df(spark, _one_event("K", 100, "third")),
                epoch_id=2, mode="mor")
    assert t.scan().collect()[0]["text"] == "first"


def test_append_refused_on_delta_bearing_table(spark, tmp_path):
    """append() rows into a delta-bearing bucket would silently join that
    bucket's LWW resolve (visibility depending on unrelated MOR activity)
    — refused until deltas are folded."""
    import pytest

    base = FX.make_transcripts(seed=103, n_convs=10, max_turns=4)
    t = fresh(spark, str(tmp_path / "t"), base)
    ev = FX.make_change_events(seed=104, n_events=300, n_convs=12, max_turns=4)
    merge_apply(t, FX.change_events_df(spark, ev), epoch_id=0, mode="mor")
    with pytest.raises(ValueError, match="delta"):
        t.append(FX.table_rows_df(spark, base.iloc[:2]))
    t.compact(min_files_per_bucket=1)
    t.append(FX.table_rows_df(spark, base.iloc[:2]))  # folded → allowed


def test_mor_streaming_with_auto_compaction(spark, tmp_path):
    """CdcStream(merge_mode='mor') end-to-end: delta-append microbatches +
    in-loop auto-compaction bound the file count, survive a crash/resume
    from checkpoint, and land the exact oracle state."""
    import pytest

    from battetl_spark.streaming import CdcStream, read_change_event_stream

    base = FX.make_transcripts(seed=105, n_convs=25, max_turns=6)
    ev = FX.make_change_events(seed=106, n_events=1200, n_convs=30, max_turns=6)
    src = str(tmp_path / "events")
    for ch in np.array_split(ev, 5):
        FX.change_events_df(spark, ch.reset_index(drop=True)).coalesce(1) \
            .write.mode("append").parquet(src)
    t = fresh(spark, str(tmp_path / "t"), base)
    ckpt = str(tmp_path / "ckpt")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        if epoch_id == 2 and phase == "after_merge" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash")

    s = CdcStream(t, ckpt, merge_mode="mor", auto_compact_files=4,
                  fail_injector=injector)
    with pytest.raises(Exception):
        s.run_to_completion(read_change_event_stream(spark, src))
    assert crashed["done"]
    CdcStream(t, ckpt, merge_mode="mor", auto_compact_files=4) \
        .run_to_completion(read_change_event_stream(spark, src))

    expected = FX.pandas_oracle_replay(base, ev)[ALL].reset_index(drop=True)
    pd.testing.assert_frame_equal(state(t), expected, check_dtype=False)
    # auto-compaction kept per-bucket file counts bounded
    worst = max(len(e) for e in t.snapshot()["files"].values())
    assert worst <= 4 + 2  # threshold + at most one post-compact delta batch


def test_mor_change_data_feed(spark, tmp_path):
    """changes_between across MOR commits: the delta append changes the
    bucket's file list (so the bucket is diffed) and both sides scan through
    the resolve — the feed equals the brute-force state diff."""
    base = FX.make_transcripts(seed=107, n_convs=20, max_turns=5)
    ev = FX.make_change_events(seed=108, n_events=600, n_convs=25, max_turns=5)
    t = fresh(spark, str(tmp_path / "t"), base)
    v0 = t.snapshot()["version"]
    merge_apply(t, FX.change_events_df(spark, ev), epoch_id=0, mode="mor")

    cdf = t.changes_between(v0).toPandas()
    old = t.scan_at(v0).toPandas().set_index(["conv_id", "turn_idx"])
    new = t.scan().toPandas().set_index(["conv_id", "turn_idx"])
    got = cdf.set_index(["conv_id", "turn_idx"])
    assert set(got[got._change_type == "insert"].index) == (
        set(new.index) - set(old.index)
    )
    assert set(got[got._change_type == "delete"].index) == (
        set(old.index) - set(new.index)
    )
    both = set(new.index) & set(old.index)
    exp_upd = {
        k for k in both if new.loc[k, "_last_lsn"] > old.loc[k, "_last_lsn"]
    }
    assert set(got[got._change_type == "update"].index) == exp_upd


def test_mor_cdf_between_delta_bearing_versions(spark, tmp_path):
    """Round-3 verdict task #6: changes_between where BOTH endpoints carry
    un-compacted deltas (v_from itself delta-bearing, several delta commits
    in the window) must equal the brute-force state diff — both side scans
    resolve through their outstanding deltas. And a compaction-only window
    must report ZERO changes (folding deltas is not a logical change)."""
    base = FX.make_transcripts(seed=111, n_convs=20, max_turns=5)
    ev = FX.make_change_events(seed=112, n_events=900, n_convs=25, max_turns=5,
                               dup_rate=0.05)
    chunks = np.array_split(ev, 3)
    t = fresh(spark, str(tmp_path / "t"), base)
    merge_apply(t, FX.change_events_df(spark, chunks[0].reset_index(drop=True)),
                epoch_id=0, mode="mor")
    v_from = t.snapshot()["version"]
    assert any(  # v_from has outstanding deltas
        e.get("delta") for entries in t.snapshot_at(v_from)["files"].values()
        for e in entries
    )
    for i, ch in enumerate(chunks[1:], start=1):
        merge_apply(t, FX.change_events_df(spark, ch.reset_index(drop=True)),
                    epoch_id=i, mode="mor")
    v_to = t.snapshot()["version"]
    assert any(
        e.get("delta") for entries in t.snapshot_at(v_to)["files"].values()
        for e in entries
    )

    cdf = t.changes_between(v_from, v_to).toPandas()
    old = t.scan_at(v_from).toPandas().set_index(["conv_id", "turn_idx"])
    new = t.scan_at(v_to).toPandas().set_index(["conv_id", "turn_idx"])
    got = cdf.set_index(["conv_id", "turn_idx"])
    assert set(got[got._change_type == "insert"].index) == (
        set(new.index) - set(old.index)
    )
    assert set(got[got._change_type == "delete"].index) == (
        set(old.index) - set(new.index)
    )
    both = set(new.index) & set(old.index)
    exp_upd = {
        k for k in both if new.loc[k, "_last_lsn"] > old.loc[k, "_last_lsn"]
    }
    assert set(got[got._change_type == "update"].index) == exp_upd
    # exactly one row per changed key — the resolve yielded single winners
    assert got.index.is_unique

    # compaction folds deltas with NO logical change → empty feed
    assert t.compact(min_files_per_bucket=1) is not None
    assert not any(
        e.get("delta") for entries in t.snapshot()["files"].values()
        for e in entries
    )
    assert t.changes_between(v_to).count() == 0


def test_mor_scan_filters_still_exact(spark, tmp_path):
    """Zone-map file skipping is disabled on delta-bearing buckets (skipping
    a base file could promote an older row past the filter) — filtered
    scans must equal filter-after-resolve exactly."""
    base = FX.make_transcripts(seed=101, n_convs=25, max_turns=5)
    ev = FX.make_change_events(seed=102, n_events=1000, n_convs=30, max_turns=5)
    t = replay(spark, fresh(spark, str(tmp_path / "t"), base), ev, n_batches=2)
    wm = int(ev["lsn"].max()) // 2
    got = (
        t.scan(filters=[("_last_lsn", ">", wm)])
        .orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)
    )
    exp = (
        t.scan().filter(f"_last_lsn > {wm}")
        .orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
