"""Streaming replay-equivalence + crash/resume exactly-once (FIXTURES.md F3/F5).

Final table state must be identical for: one-shot batch apply, K-microbatch
streaming apply, and resume-from-checkpoint after a mid-replay kill — both
crash-before-commit and crash-after-commit (the fence makes the replayed
epoch a no-op)."""

from __future__ import annotations

import numpy as np
import pytest

from battetl_spark import fixtures as FX
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from battetl_spark.streaming import CdcStream, read_change_event_stream
from tests.conftest import assert_pdf_equal

pytestmark = pytest.mark.streaming

ALL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


@pytest.fixture(scope="module")
def base_pdf():
    return FX.make_transcripts(seed=42, n_convs=40, max_turns=10)


@pytest.fixture(scope="module")
def events_pdf():
    return FX.make_change_events(
        seed=43, n_events=2000, n_convs=50, max_turns=10, dup_rate=0.03
    )


@pytest.fixture(scope="module")
def expected(base_pdf, events_pdf):
    return FX.pandas_oracle_replay(base_pdf, events_pdf)


def write_event_files(spark, events_pdf, path, k):
    for chunk in np.array_split(events_pdf, k):
        df = FX.change_events_df(spark, chunk.reset_index(drop=True))
        df.coalesce(1).write.mode("append").parquet(path)


def seeded(spark, path, base_pdf):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_TABLE_SCHEMA, num_buckets=8,
        key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )
    t.append(FX.table_rows_df(spark, base_pdf))
    return t


def state(t):
    return t.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)


def test_streaming_apply_matches_oracle(spark, tmp_path, base_pdf, events_pdf, expected):
    src = str(tmp_path / "events")
    write_event_files(spark, events_pdf, src, k=5)
    t = seeded(spark, str(tmp_path / "table"), base_pdf)
    stream = CdcStream(t, str(tmp_path / "ckpt"))
    stream.run_to_completion(read_change_event_stream(spark, src))
    assert_pdf_equal(state(t), expected, KEY_COLS)
    # every epoch fenced exactly once
    assert len(t.fences()) >= 1


@pytest.mark.parametrize("crash_phase", ["before_merge", "after_merge"])
def test_crash_resume_from_checkpoint(
    spark, tmp_path, base_pdf, events_pdf, expected, crash_phase
):
    src = str(tmp_path / f"events-{crash_phase}")
    write_event_files(spark, events_pdf, src, k=6)
    t = seeded(spark, str(tmp_path / f"table-{crash_phase}"), base_pdf)
    ckpt = str(tmp_path / f"ckpt-{crash_phase}")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        if epoch_id == 2 and phase == crash_phase and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError(f"injected crash at epoch {epoch_id} {phase}")

    stream = CdcStream(t, ckpt, fail_injector=injector)
    with pytest.raises(Exception):
        stream.run_to_completion(read_change_event_stream(spark, src))
    assert crashed["done"]
    mid_version = t.snapshot()["version"]

    # restart from the same checkpoint, no injector → resumes + finishes
    stream2 = CdcStream(t, ckpt)
    stream2.run_to_completion(read_change_event_stream(spark, src))
    assert t.snapshot()["version"] > mid_version
    assert_pdf_equal(state(t), expected, KEY_COLS)

    if crash_phase == "after_merge":
        # epoch 2 was committed before the crash; the replay must have been
        # fenced — exactly one lineage record for epoch 2.
        lin = t.lineage_df().toPandas()
        assert (lin["epoch_id"] == 2).sum() == lin[lin.epoch_id == 2][
            "source_partition"
        ].nunique()


def test_long_stream_auto_compaction_bounds_files(
    spark, tmp_path, base_pdf, events_pdf, expected
):
    """50-microbatch stream with auto-compaction: files-per-bucket stays
    bounded (a long-running stream must not accrete one file per commit
    forever) and the final state still equals the oracle replay."""
    src = str(tmp_path / "events-long")
    write_event_files(spark, events_pdf, src, k=50)
    t = seeded(spark, str(tmp_path / "table-long"), base_pdf)
    stream = CdcStream(t, str(tmp_path / "ckpt-long"), auto_compact_files=6)
    stream.run_to_completion(
        read_change_event_stream(spark, src, max_files_per_trigger=1),
        timeout_s=1800,
    )
    # every epoch fenced (default auto fence-compaction may fold a prefix
    # into the floor watermark — has_fence spans both)
    assert all(t.has_fence(e) for e in range(50))
    assert int(t.fence_floor()) + len(t.fences()) + 1 >= 50
    snap = t.snapshot()
    worst = max(len(entries) for entries in snap["files"].values())
    # threshold 6 + at most a handful of post-compaction commits before the
    # next sweep; without compaction buckets reach ~50+ files here
    assert worst <= 12, f"files-per-bucket unbounded: {worst}"
    assert_pdf_equal(state(t), expected, KEY_COLS)


def test_windowed_metrics_watermark_drops_late_events(spark, tmp_path):
    """Event-time windowed agg with watermark (§2.9): finalized windows emit
    exactly once in append mode; an event arriving after the watermark
    passed its window is DROPPED (bounded state), not re-emitted."""
    import pandas as pd

    from battetl_spark.streaming import windowed_metrics_stream

    src = str(tmp_path / "wm-events")
    base = pd.Timestamp("2024-01-01 00:30:00")

    def events_file(rows):
        pdf = pd.DataFrame(
            {
                "lsn": [r[0] for r in rows],
                "op": [r[1] for r in rows],
                "conv_id": ["c"] * len(rows),
                "turn_idx": [0] * len(rows),
                "role": ["user"] * len(rows),
                "text": ["t"] * len(rows),
                "tool": [None] * len(rows),
                "ts": [base + pd.Timedelta(hours=r[2]) for r in rows],
                "source_partition": [0] * len(rows),
            }
        )
        FX.change_events_df(spark, pdf).coalesce(1).write.mode("append").parquet(src)

    import time

    # batch 1: 3 events in the hour-0 window, 1 in hour-3 (advances the
    # watermark to 02:30 ⇒ hour-0 finalizes and emits at the next batch)
    events_file([(1, "i", 0), (2, "u", 0.2), (3, "i", 0.4), (4, "i", 3)])
    time.sleep(1.2)  # distinct mtimes keep the file-source batch order
    # batch 2: hour-6 event → hour-0 emits here (watermark 02:30), watermark
    # advances to 05:30 ⇒ hour-3 finalizes next
    events_file([(6, "i", 6)])
    time.sleep(1.2)
    # batch 3: a LATE hour-0 event arriving AFTER its window's state was
    # evicted — must be dropped, never re-emitted as a new hour-0 row
    events_file([(5, "u", 0.1)])

    collected = []

    def sink(df, epoch):
        collected.extend(r.asDict() for r in df.collect())

    stream = windowed_metrics_stream(
        spark.readStream.schema(FX.CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        window_duration="1 hour",
        watermark="1 hour",
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert q.exception() is None
    by_key = {(r["window_start"].hour, r["op"]): r["n_events"] for r in collected}
    # hour-0 window finalized with exactly the 3 on-time events; the late
    # lsn=5 update (post-eviction) was DROPPED — not counted, not re-emitted
    assert by_key[(0, "i")] == 2 and by_key[(0, "u")] == 1
    assert sum(1 for r in collected if r["window_start"].hour == 0) == 2
    # hour-3 window flushed once the watermark passed it
    assert by_key[(3, "i")] == 1
    # append mode: every finalized window emitted exactly once
    assert len(collected) == len({(r["window_start"], r["op"]) for r in collected})


def test_metrics_table_lineage_per_batch(spark, tmp_path, base_pdf, events_pdf):
    """North-rule metrics feed: per-partition lineage rows (source offsets,
    snapshot id, row counts) land in a queryable metrics table, once per
    applied epoch, and reconcile with the table's own lineage."""
    src = str(tmp_path / "events-metrics")
    write_event_files(spark, events_pdf, src, k=4)
    t = seeded(spark, str(tmp_path / "table-metrics"), base_pdf)
    metrics = str(tmp_path / "metrics")
    stream = CdcStream(t, str(tmp_path / "ckpt-metrics"), metrics_dir=metrics)
    stream.run_to_completion(read_change_event_stream(spark, src))

    m = spark.read.parquet(metrics)
    assert set(m.columns) >= {
        "epoch_id", "source_partition", "min_lsn", "max_lsn",
        "rows_inserted", "rows_updated", "rows_deleted", "snapshot_id",
    }
    assert m.select("epoch_id").distinct().count() == 4
    # offsets cover the whole log exactly
    lo, hi = m.agg({"min_lsn": "min", "max_lsn": "max"}).first()
    assert lo == events_pdf["lsn"].min() and hi == events_pdf["lsn"].max()
    # one row per (epoch, source_partition)
    assert m.count() == m.select("epoch_id", "source_partition").distinct().count()
    # reconciles with the snapshot-embedded lineage
    snap_lineage = t.lineage_df()
    assert snap_lineage.count() == m.count()


def test_metrics_feed_heals_after_crash_between_commit_and_append(
    spark, tmp_path, base_pdf, events_pdf
):
    """ADVICE fix: a crash AFTER the merge commit but BEFORE the metrics
    append must not lose that epoch's metrics forever. On the fenced replay
    the stream recovers the epoch's lineage from the snapshot-embedded copy
    and appends it — every applied epoch ends up in the metrics table
    exactly once."""
    src = str(tmp_path / "events-mheal")
    write_event_files(spark, events_pdf, src, k=4)
    t = seeded(spark, str(tmp_path / "table-mheal"), base_pdf)
    metrics = str(tmp_path / "metrics-mheal")
    ckpt = str(tmp_path / "ckpt-mheal")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        # after_merge fires after the merge commit, before the metrics write
        if epoch_id == 1 and phase == "after_merge" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between commit and metrics")

    stream = CdcStream(t, ckpt, metrics_dir=metrics, fail_injector=injector)
    with pytest.raises(Exception):
        stream.run_to_completion(read_change_event_stream(spark, src))
    assert crashed["done"]

    stream2 = CdcStream(t, ckpt, metrics_dir=metrics)
    stream2.run_to_completion(read_change_event_stream(spark, src))

    m = spark.read.parquet(metrics).toPandas()
    assert set(m.epoch_id.unique()) == {0, 1, 2, 3}  # crashed epoch healed
    # exactly once per (epoch, source_partition) — the heal didn't duplicate
    assert len(m) == len(m[["epoch_id", "source_partition"]].drop_duplicates())
    assert t.lineage_df().count() == len(m)


def test_stream_auto_fence_compaction_bounds_fence_map(
    spark, tmp_path, base_pdf, events_pdf, expected
):
    """A long-lived stream must not grow the fence map O(epochs): with
    auto_compact_fences_every set, the contiguous fenced prefix folds into
    fence_floor during the loop, replay fencing still holds, and the final
    state is oracle-equal."""
    src = str(tmp_path / "events-fc")
    write_event_files(spark, events_pdf, src, k=12)
    t = seeded(spark, str(tmp_path / "table-fc"), base_pdf)
    stream = CdcStream(t, str(tmp_path / "ckpt-fc"), auto_compact_fences_every=4)
    stream.run_to_completion(read_change_event_stream(spark, src))

    assert t.fence_floor() >= 7  # most epochs folded during the run
    assert len(t.fences()) <= 4  # map holds only the un-folded tail
    for e in range(12):
        assert t.has_fence(e)
    assert_pdf_equal(state(t), expected, KEY_COLS)

    # a resumed stream over the same source replays nothing
    v0 = t.snapshot()["version"]
    CdcStream(t, str(tmp_path / "ckpt-fc")).run_to_completion(
        read_change_event_stream(spark, src)
    )
    assert t.snapshot()["version"] == v0


def test_kafka_adapter_streaming_frame(spark, tmp_path, base_pdf, events_pdf, expected):
    """kafka_to_change_events is a pure column mapping, so it must compose
    with a STREAMING frame: kafka-shaped records tailed via readStream →
    adapter → CdcStream replays to the oracle state."""
    from pyspark.sql import functions as F

    from battetl_spark.streaming import change_events_to_kafka, kafka_to_change_events

    P = 4
    env = FX.change_events_df(spark, events_pdf)
    part = (F.pmod(F.xxhash64("conv_id"), F.lit(P))).cast("int")
    # build per-partition-ordered kafka records: offset dense per partition
    from pyspark.sql import Window

    w = Window.partitionBy(part).orderBy("lsn")
    enveloped = env.withColumn(
        "lsn",
        ((F.row_number().over(w) - 1) * P + part).cast("long"),
    )
    kafka_dir = str(tmp_path / "kafka-frames")
    frames = change_events_to_kafka(enveloped, P)
    for i in range(3):
        frames.filter(F.pmod(F.col("offset"), F.lit(3)) == i).coalesce(1) \
            .write.mode("append").parquet(kafka_dir)

    t = seeded(spark, str(tmp_path / "table-kf"), base_pdf)
    raw = (
        spark.readStream.schema(frames.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(kafka_dir)
    )
    CdcStream(t, str(tmp_path / "ckpt-kf")).run_to_completion(
        kafka_to_change_events(raw, P)
    )
    # lsns were renumbered by the kafka framing; payload state must match
    pay = [c for c in ALL_COLS if c != "_last_lsn"]
    got = t.scan().orderBy(*KEY_COLS).toPandas()[pay].reset_index(drop=True)
    exp = expected[pay].reset_index(drop=True)
    assert got.equals(exp)


def test_metrics_heal_no_spurious_warning_when_lineage_was_off(
    spark, tmp_path, base_pdf, events_pdf
):
    """ADVICE fix: if the run that FENCED an epoch had collect_lineage=False,
    its snapshot legitimately carries no lineage — a resumed stream with
    collect_lineage=True must treat the empty heal as a config difference,
    not warn 'vacuumed before replay?' (which misreads it as data loss)."""
    import warnings

    src = str(tmp_path / "events-nolin")
    write_event_files(spark, events_pdf, src, k=3)
    t = seeded(spark, str(tmp_path / "table-nolin"), base_pdf)
    metrics = str(tmp_path / "metrics-nolin")
    ckpt = str(tmp_path / "ckpt-nolin")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        if epoch_id == 1 and phase == "after_merge" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between commit and metrics")

    # fencing run collects NO lineage, crashes between commit and metrics
    stream = CdcStream(t, ckpt, metrics_dir=metrics, collect_lineage=False,
                       fail_injector=injector)
    with pytest.raises(Exception):
        stream.run_to_completion(read_change_event_stream(spark, src))
    assert crashed["done"]

    # resume WITH lineage: the fenced epoch has no snapshot lineage to heal
    # from, but the fencing commit is retained → benign, no warning
    stream2 = CdcStream(t, ckpt, metrics_dir=metrics)
    with warnings.catch_warnings():
        # catch_warnings mutates the GLOBAL filter list, so the foreachBatch
        # callback thread sees it too: the heal warning would fail the batch
        warnings.filterwarnings(
            "error", message="metrics heal", category=RuntimeWarning
        )
        stream2.run_to_completion(read_change_event_stream(spark, src))


def test_two_table_exactly_once_stats_catchup_after_crash(
    spark, tmp_path, base_pdf, events_pdf, expected
):
    """Transcripts + incrementally-maintained stats fence the same epoch
    independently: a crash BETWEEN the two commits (after merge, before
    stats refresh) replays the epoch — the merge is a fence no-op, the
    stats refresh still runs — and the final stats equal a full recompute
    from the final table."""
    from battetl_spark.analytics.rollups import conversation_stats
    from battetl_spark.cdc.stats_maintenance import create_stats_table, refresh_stats

    src = str(tmp_path / "events-2t")
    write_event_files(spark, events_pdf, src, k=5)
    t = seeded(spark, str(tmp_path / "table-2t"), base_pdf)
    stats = create_stats_table(spark, str(tmp_path / "stats-2t"), num_buckets=4)
    refresh_stats(t, stats, t.scan().select("conv_id").distinct(), epoch_id=-100)
    ckpt = str(tmp_path / "ckpt-2t")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        # crash exactly between the transcripts commit and the stats commit
        if epoch_id == 2 and phase == "after_merge" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between the two table commits")

    stream = CdcStream(t, ckpt, stats_table=stats, fail_injector=injector)
    with pytest.raises(Exception):
        stream.run_to_completion(read_change_event_stream(spark, src))
    assert crashed["done"]
    assert t.has_fence(2) and not stats.has_fence(2)  # the dangerous gap

    stream2 = CdcStream(t, ckpt, stats_table=stats)
    stream2.run_to_completion(read_change_event_stream(spark, src))
    assert_pdf_equal(state(t), expected, KEY_COLS)
    assert all(stats.has_fence(e) for e in range(5))

    cols = [f.name for f in stats.schema.fields if not f.name.startswith("_")]
    got = stats.scan().orderBy("conv_id").toPandas()[cols].reset_index(drop=True)
    full = conversation_stats(t.scan()).toPandas()[cols].reset_index(drop=True)
    assert_pdf_equal(got, full, ["conv_id"])
