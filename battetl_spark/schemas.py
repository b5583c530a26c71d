"""Schemas for the transcript CDC engine.

The transcript table shape is fixed by BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). The change-event envelope adds (lsn, op, source_partition)
— the WAL/binlog frame around a row image, analogous to the reference's
per-file rows + MAX(unixtime_s) watermark bookkeeping
(reference battetl/load/Loader.py:144-234).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Internal column carried on stored rows: the LSN of the event that produced
# the row's current image. Late events (lsn <= _last_lsn) must be no-ops
# (reference analog: watermark drop, Loader.py:174-180).
LAST_LSN_COL = "_last_lsn"

# Tombstone marker: deletes keep a fencing row (payload nulled, _deleted=true,
# _last_lsn = delete lsn) so a late out-of-order update arriving in a LATER
# microbatch still loses to the delete. Public scans filter tombstones; a
# vacuum can drop tombstones older than the source's max reorder horizon.
DELETED_COL = "_deleted"

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampNTZType(), True),
]

TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# Stored table schema = transcript columns + LWW/tombstone bookkeeping.
TRANSCRIPT_TABLE_SCHEMA = T.StructType(
    TRANSCRIPT_FIELDS
    + [
        T.StructField(LAST_LSN_COL, T.LongType(), False),
        T.StructField(DELETED_COL, T.BooleanType(), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'i' | 'u' | 'd'
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("source_partition", T.IntegerType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("source_partition", T.IntegerType(), True),
        T.StructField("min_lsn", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("rows_inserted", T.LongType(), False),
        T.StructField("rows_updated", T.LongType(), False),
        T.StructField("rows_deleted", T.LongType(), False),
        # CommitConflict rebases this merge absorbed before committing —
        # visibility into multi-writer contention (0 = clean first attempt).
        # Nullable: metrics parquet written before the column existed reads
        # as NULL under this schema / mergeSchema instead of erroring
        T.StructField("rebases", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("committed_at", T.TimestampNTZType(), False),
    ]
)

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool", "ts"]
