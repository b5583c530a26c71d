"""Custom stateful streaming dedup via applyInPandasWithState (SURVEY §2.9).

The foreachBatch pipeline (battetl_spark.streaming.pipeline) keeps LWW state
in the table itself (``_last_lsn``). This module is the alternative shape:
state lives in Spark's checkpointed state store, keyed by (conv_id,
turn_idx), holding the max applied LSN — incoming events at-or-below it are
filtered INSIDE the stream, so the sink receives only effective changes.

Use case: a dumb downstream sink (plain append log, external system without
merge) that must still get exactly the LWW-effective change stream. The
kernel is Arrow-batched pandas (the approved vectorized path), state is one
int per key, and Spark handles state checkpointing/recovery.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from battetl_spark.schemas import CHANGE_EVENT_SCHEMA

STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType(), True)])

EFFECTIVE_CHANGE_SCHEMA = T.StructType(
    [f for f in CHANGE_EVENT_SCHEMA.fields if f.name != "source_partition"]
)


def _dedup_fn(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    max_lsn = state.get[0] if state.exists else -1
    best = None
    for pdf in batches:
        pdf = pdf[pdf["lsn"] > max_lsn]
        if len(pdf) == 0:
            continue
        cand = pdf.loc[pdf["lsn"].idxmax()]
        if best is None or cand["lsn"] > best["lsn"]:
            best = cand
    if best is not None:
        state.update((int(best["lsn"]),))
        out = best.to_frame().T
        out = out[[f.name for f in EFFECTIVE_CHANGE_SCHEMA.fields]]
        out["lsn"] = out["lsn"].astype("int64")
        out["turn_idx"] = out["turn_idx"].astype("int32")
        yield out


def effective_changes_stream(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of LWW-effective changes: at most one row per key
    per microbatch, never an event at-or-below the key's applied max LSN —
    even across batches and restarts (state store is checkpointed).

    Consumers must use ``outputMode("update")`` (this operator runs in
    update mode; file sinks need a foreachBatch wrapper, and the memory sink
    cannot recover from a checkpoint — restart tests need foreachBatch)."""
    return events.groupBy("conv_id", "turn_idx").applyInPandasWithState(
        _dedup_fn,
        outputStructType=EFFECTIVE_CHANGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
