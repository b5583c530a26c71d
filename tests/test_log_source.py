"""Partitioned-log (Kafka-shaped) source adapter.

Pins the adapter contract: per-partition ordered offsets map to a total lsn
order, keys are partition-sticky (keyed-producer), and the merge converges
to the single-log answer even when partitions are delivered wildly
out-of-order relative to each other — including across a crash/resume from
checkpoint mid-stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from battetl_spark import fixtures as FX
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from battetl_spark.streaming import CdcStream, FilePartitionedLog

pytestmark = pytest.mark.streaming

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
P = 4


@pytest.fixture(scope="module")
def events_pdf():
    return FX.make_change_events(
        seed=77, n_events=1500, n_convs=40, max_turns=8, dup_rate=0.02
    )


def build_skewed_log(spark, path, events_pdf):
    """Publish the log so partitions interleave badly: each partition's
    events arrive in order (producer contract) but whole partitions are
    delivered in shuffled order, split across two rounds."""
    log = FilePartitionedLog.create(spark, path, P)
    ev = FX.change_events_df(spark, events_pdf)
    part = F.pmod(F.xxhash64("conv_id"), F.lit(P)).cast("int")
    mid = int(events_pdf["lsn"].median())
    for lo, hi in ((None, mid), (mid, None)):  # two seq rounds, in order
        for p in (2, 0, 3, 1):  # partitions delivered out of order
            chunk = ev.filter(part == p)
            if lo is None:
                chunk = chunk.filter(F.col("lsn") <= hi)
            else:
                chunk = chunk.filter(F.col("lsn") > lo)
            if chunk.count():
                log.publish(chunk)
    return log


def fresh_table(spark, path):
    return LakeTable.create(
        spark, path, TRANSCRIPT_TABLE_SCHEMA, num_buckets=8,
        key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )


def payload_state(t):
    return (
        t.scan().orderBy(*KEY_COLS).toPandas()[PAYLOAD].reset_index(drop=True)
    )


def test_partitioned_log_contract(spark, tmp_path, events_pdf):
    log = build_skewed_log(spark, str(tmp_path / "log"), events_pdf)
    meta = log.meta()
    assert meta["segments"] >= 8
    rows = log.read_all()
    # keys are partition-sticky (keyed-producer contract)
    assert (
        rows.groupBy("conv_id")
        .agg(F.countDistinct("source_partition").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # offsets are dense per partition: count == high-water offset
    per = {
        str(r["source_partition"]): r["n"]
        for r in rows.groupBy("source_partition").agg(F.count("*").alias("n")).collect()
    }
    assert per == {p: n for p, n in meta["next_offset"].items() if n}
    # lsn = offset * P + partition is collision-free
    assert rows.select("lsn").distinct().count() == rows.count()


def test_partitioned_log_replays_equal_to_single_log(spark, tmp_path, events_pdf):
    log4 = build_skewed_log(spark, str(tmp_path / "log4"), events_pdf)
    t4 = fresh_table(spark, str(tmp_path / "t4"))
    CdcStream(t4, str(tmp_path / "ckpt4")).run_to_completion(
        log4.read_stream(max_files_per_trigger=1)
    )

    log1 = FilePartitionedLog.create(spark, str(tmp_path / "log1"), 1)
    log1.publish(FX.change_events_df(spark, events_pdf))
    t1 = fresh_table(spark, str(tmp_path / "t1"))
    CdcStream(t1, str(tmp_path / "ckpt1")).run_to_completion(
        log1.read_stream(max_files_per_trigger=1)
    )

    # identical payload state (lsns differ by construction: offsets × P)
    assert payload_state(t4).equals(payload_state(t1))

    # and both equal the sequential pandas oracle over the raw seq order
    expected = FX.pandas_oracle_replay(None, events_pdf)[PAYLOAD].reset_index(
        drop=True
    )
    assert payload_state(t4).equals(expected)


def test_kafka_envelope_replay_equal(spark, tmp_path, events_pdf):
    """The Kafka envelope adapter must produce the exact change-event
    envelope FilePartitionedLog produces for the same events: publish to
    the file log, re-frame its segments as Kafka records (binary key/value,
    partition, offset), adapt, and compare — then replay both through the
    merge and compare final table state."""
    from battetl_spark.streaming import (
        change_events_to_kafka,
        kafka_to_change_events,
    )

    log = build_skewed_log(spark, str(tmp_path / "log"), events_pdf)
    envelope = log.read_all()

    kafka_frame = change_events_to_kafka(envelope, P)
    assert set(kafka_frame.columns) == {
        "key", "value", "topic", "partition", "offset", "timestamp"
    }
    assert dict(kafka_frame.dtypes)["value"] == "binary"
    adapted = kafka_to_change_events(kafka_frame, P)

    a = envelope.orderBy("lsn").toPandas().reset_index(drop=True)
    b = adapted.orderBy("lsn").toPandas().reset_index(drop=True)
    assert a.columns.tolist() == b.columns.tolist()
    assert a.equals(b)

    # and the adapted stream replays to the identical table state
    t = fresh_table(spark, str(tmp_path / "t"))
    from battetl_spark.cdc import merge_apply

    merge_apply(t, adapted, epoch_id=0)
    expected = FX.pandas_oracle_replay(None, events_pdf)[PAYLOAD].reset_index(
        drop=True
    )
    assert payload_state(t).equals(expected)


def test_publish_crash_leaves_log_consistent(spark, tmp_path, events_pdf):
    """A crash mid-publish must not corrupt the log: a segment dir is
    invisible to readers until renamed into seg-*, and a retry after any
    crash point collides with nothing. Simulated by failing the rename."""
    import os

    log = FilePartitionedLog.create(spark, str(tmp_path / "log"), P)
    ev = FX.change_events_df(spark, events_pdf)
    half = int(events_pdf["lsn"].median())
    first = ev.filter(F.col("lsn") <= half)
    second = ev.filter(F.col("lsn") > half)
    log.publish(first)

    real_rename = os.rename
    import unittest.mock as mock

    def exploding_rename(src, dst):
        raise OSError("injected crash before segment rename")

    with mock.patch("battetl_spark.streaming.log_source.os.rename",
                    exploding_rename):
        with pytest.raises(OSError):
            log.publish(second)

    # the half-published segment is invisible: readers see only the first
    visible = log.read_all()
    assert visible.count() == first.count()

    # retry succeeds and the log converges to the full event set with
    # collision-free lsns (offset gaps from the crashed attempt are fine)
    log.publish(second)
    rows = log.read_all()
    assert rows.count() == ev.count()
    assert rows.select("lsn").distinct().count() == rows.count()
    # keys still partition-sticky
    assert (
        rows.groupBy("conv_id")
        .agg(F.countDistinct("source_partition").alias("k"))
        .filter(F.col("k") > 1).count() == 0
    )


def test_publish_same_seq_offsets_deterministic(spark, tmp_path):
    """Two events sharing a seq value must get a stable relative order
    (key/op tiebreak) — publish the same frame into two logs and compare
    assigned offsets row-for-row."""
    import pandas as pd

    pdf = FX.make_change_events(seed=88, n_events=200, n_convs=10, max_turns=4)
    pdf = pdf.copy()
    pdf["lsn"] = (pdf["lsn"] // 4) * 4  # force heavy seq ties
    # rows fully tied on (seq, key, turn, op) have no defined relative
    # order even with the tiebreak — exclude them, they aren't the contract
    pdf = pdf.drop_duplicates(subset=["lsn", "conv_id", "turn_idx", "op"])
    ev = FX.change_events_df(spark, pdf)

    frames = []
    for name in ("a", "b"):
        log = FilePartitionedLog.create(spark, str(tmp_path / name), P)
        # shuffle input partitioning differently per log
        log.publish(ev.repartition(3 if name == "a" else 7))
        frames.append(
            log.read_all()
            .orderBy("conv_id", "turn_idx", "op", "text", "lsn")
            .select("lsn", "conv_id", "turn_idx", "op")
            .toPandas().reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_partitioned_log_resume_from_checkpoint(spark, tmp_path, events_pdf):
    log = build_skewed_log(spark, str(tmp_path / "log"), events_pdf)
    t = fresh_table(spark, str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        if epoch_id == 2 and phase == "after_merge" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash mid-stream")

    with pytest.raises(Exception):
        CdcStream(t, ckpt, fail_injector=injector).run_to_completion(
            log.read_stream(max_files_per_trigger=1)
        )
    assert crashed["done"]

    CdcStream(t, ckpt).run_to_completion(log.read_stream(max_files_per_trigger=1))
    expected = FX.pandas_oracle_replay(None, events_pdf)[PAYLOAD].reset_index(
        drop=True
    )
    assert payload_state(t).equals(expected)


def test_kafka_offset_decompose_exact_for_huge_lsn(spark):
    """lsn → (offset, partition) decomposition must be exact integer math:
    float division rounds beyond ~2^53 and silently corrupts the offset
    (round-5 ADVICE). Round-trip lsns near 2^60 through the Kafka framing."""
    from battetl_spark.streaming import (
        change_events_to_kafka,
        kafka_to_change_events,
    )

    p = 3  # non-power-of-two: float division is inexact
    big = [(1 << 60) + k for k in (1, 2, 5, 7, 11)] + [(1 << 53) + 3, 12345]
    pdf = FX.make_change_events(seed=9, n_events=20, n_convs=3, max_turns=4)
    pdf = pdf.head(len(big)).copy()
    pdf["lsn"] = big
    env = FX.change_events_df(spark, pdf)
    back = kafka_to_change_events(change_events_to_kafka(env, p), p)
    got = sorted(r["lsn"] for r in back.select("lsn").collect())
    assert got == sorted(big)


def _kafka_frame(spark, values: list[bytes]):
    import datetime

    rows = [
        (b"k", v, "transcript-cdc", i % P, i // P,
         datetime.datetime(2024, 1, 1, 0, 0, i))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, "
              "offset long, timestamp timestamp",
    )


def test_kafka_malformed_payload_policies(spark):
    """Corrupt Kafka values must not flow silently into the merge: 'fail'
    errors loudly (unparseable JSON or a parsed payload missing op);
    'drop' filters them (round-5 ADVICE)."""
    from battetl_spark.streaming import kafka_to_change_events

    good = (b'{"op":"insert","conv_id":"c1","turn_idx":0,"role":"user",'
            b'"text":"hi","tool":null,"ts":"2024-01-01T00:00:00"}')
    bad_json = b"{not json at all"
    missing_op = (b'{"conv_id":"c2","turn_idx":1,"role":"user","text":"x",'
                  b'"tool":null,"ts":"2024-01-01T00:00:00"}')

    dropped = kafka_to_change_events(
        _kafka_frame(spark, [good, bad_json, missing_op]), P, malformed="drop"
    )
    rows = dropped.collect()
    assert [r["conv_id"] for r in rows] == ["c1"]

    for bad in (bad_json, missing_op):
        frame = _kafka_frame(spark, [good, bad])
        with pytest.raises(Exception):
            kafka_to_change_events(frame, P, malformed="fail").collect()

    with pytest.raises(ValueError):
        kafka_to_change_events(_kafka_frame(spark, [good]), P, malformed="nope")


def test_publish_sweeps_stale_tmp_dirs(spark, tmp_path, events_pdf):
    """Orphaned .tmp-* segment dirs (crash before rename) are reclaimed by
    the next publish instead of leaking forever (round-5 ADVICE)."""
    import glob
    import os

    log = FilePartitionedLog.create(spark, str(tmp_path / "log"), P)
    data_dir = os.path.join(str(tmp_path / "log"), "data")
    stale = os.path.join(data_dir, ".tmp-deadbeef")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("junk")

    ev = FX.change_events_df(spark, events_pdf).limit(50)
    log.publish(ev)
    assert glob.glob(os.path.join(data_dir, ".tmp-*")) == []
    assert log.read_all().count() == 50


def test_vacuum_segments_resume_safe(spark, tmp_path, events_pdf):
    """Segment GC (round-5): segments fully consumed by every checkpoint
    are deleted; unconsumed ones survive, and a resumed stream continues
    from its checkpoint to the exact oracle state despite the deletions."""
    import glob
    import os

    log = FilePartitionedLog.create(spark, str(tmp_path / "log"), P)
    ev = FX.change_events_df(spark, events_pdf)
    lo = int(events_pdf["lsn"].quantile(0.33))
    hi = int(events_pdf["lsn"].quantile(0.66))
    log.publish(ev.filter(F.col("lsn") <= lo))
    log.publish(ev.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi)))

    t = fresh_table(spark, str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")
    CdcStream(t, ckpt).run_to_completion(log.read_stream(max_files_per_trigger=1))

    log.publish(ev.filter(F.col("lsn") > hi))
    seg_dir = os.path.join(str(tmp_path / "log"), "data")
    assert len(glob.glob(os.path.join(seg_dir, "seg-*"))) == 3

    # an uncommitted checkpoint conservatively blocks the vacuum
    assert log.vacuum_segments([ckpt, str(tmp_path / "fresh_ckpt")]) == []

    deleted = log.vacuum_segments([ckpt])
    assert len(deleted) == 2  # consumed segments reclaimed
    remaining = glob.glob(os.path.join(seg_dir, "seg-*"))
    assert len(remaining) == 1  # unconsumed segment kept

    # resume from checkpoint over the vacuumed log → exact oracle state
    CdcStream(t, ckpt).run_to_completion(log.read_stream(max_files_per_trigger=1))
    expected = FX.pandas_oracle_replay(None, events_pdf)[PAYLOAD].reset_index(
        drop=True
    )
    assert payload_state(t).equals(expected)

    # now everything is consumed: the last segment goes too
    assert log.vacuum_segments([ckpt]) == remaining
    assert glob.glob(os.path.join(seg_dir, "seg-*")) == []
