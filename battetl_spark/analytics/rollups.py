"""Per-conversation rollups — the transcript analog of cycle stats
(SURVEY.md §7 step 9; FIXTURES.md F8).

One shuffle (groupBy conv_id) with partial aggregation; every measure is a
built-in aggregate, so the whole thing stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """turn counts (total + per role), last activity, last text, tool usage —
    per conversation (A1/A2/A7/A10 patterns on the transcript payload)."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "n_assistant"
            ),
            F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
            F.sum(F.when(F.col("role") == "system", 1).otherwise(0)).alias("n_system"),
            F.max("ts").alias("last_ts"),
            F.min("ts").alias("first_ts"),
            F.max_by("text", "turn_idx").alias("last_text"),
            F.count("tool").alias("n_tool_calls"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        # no forced global sort: this feeds incremental maintenance at 1e9
        # keys — ordering is the caller's choice (VERDICT r1 #9)
    )
