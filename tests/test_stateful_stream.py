"""applyInPandasWithState dedup: cross-batch LWW filtering in-stream."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from battetl_spark import fixtures as FX
from battetl_spark.streaming.stateful import effective_changes_stream

pytestmark = pytest.mark.streaming


def test_effective_changes_filter_late_events_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    # batch files written in arrival order; batch 2 contains lsns BELOW ones
    # batch 1 already applied for the same keys (late events)
    b1 = pd.DataFrame(
        [
            {"lsn": 10, "op": "u", "conv_id": "c0", "turn_idx": np.int32(0),
             "role": "user", "text": "v10", "tool": None,
             "ts": pd.Timestamp("2026-01-01"), "source_partition": np.int32(0)},
            {"lsn": 4, "op": "u", "conv_id": "c1", "turn_idx": np.int32(0),
             "role": "user", "text": "v4", "tool": None,
             "ts": pd.Timestamp("2026-01-01"), "source_partition": np.int32(0)},
        ]
    )
    b2 = pd.DataFrame(
        [
            {"lsn": 7, "op": "u", "conv_id": "c0", "turn_idx": np.int32(0),
             "role": "user", "text": "v7-late", "tool": None,
             "ts": pd.Timestamp("2026-01-01"), "source_partition": np.int32(0)},
            {"lsn": 9, "op": "d", "conv_id": "c1", "turn_idx": np.int32(0),
             "role": None, "text": None, "tool": None,
             "ts": pd.Timestamp("2026-01-01"), "source_partition": np.int32(0)},
        ]
    )
    FX.change_events_df(spark, b1).coalesce(1).write.mode("append").parquet(src)
    FX.change_events_df(spark, b2).coalesce(1).write.mode("append").parquet(src)

    from battetl_spark.streaming import read_change_event_stream

    out = effective_changes_stream(
        read_change_event_stream(spark, src, max_files_per_trigger=1)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("effective")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from effective").collect()
    got = {(r.conv_id, r.lsn, r.op) for r in rows}
    # c0: lsn 10 applied in batch1; late lsn 7 in batch2 must be ABSENT
    assert ("c0", 10, "u") in got
    assert not any(k == "c0" and lsn == 7 for k, lsn, _ in got)
    # c1: lsn 4 applied, then lsn 9 delete is an effective change
    assert ("c1", 4, "u") in got and ("c1", 9, "d") in got
    assert len(got) == 3
