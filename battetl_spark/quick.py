"""Quick mode — single-file auto-detected ETL (reference analog:
battetl/battetl_quick.py:14-85; SURVEY.md §3.2).

The reference's quick mode spins up Postgres in docker and stubs the
metadata config; here the sink is a LakeTable directory, so "quick" is just:
read one file, classify data vs stats by shape, normalize, load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from battetl_spark.lake import LakeTable
from battetl_spark.sources.cycler_csv import read_cycler_csv
from battetl_spark.transform.normalize import (
    DEFAULT_TIMEZONE,
    detect_source,
    normalize_cycler_data,
)


def classify_file(df: DataFrame) -> str:
    """data vs per-cycle stats: stats files are one-row-per-cycle (have a
    cycle column but no per-sample time column or very few rows per cycle).
    Heuristic mirror of the reference's filename/shape dispatch
    (battetl_quick.py:31-48)."""
    cols = {c.strip().lower() for c in df.columns}
    has_time = any(("time" in c and "date" not in c) for c in cols)
    return "data" if has_time else "stats"


def battetl_quick(
    spark: SparkSession,
    file: str,
    table_path: str,
    file_meta: dict | None = None,
    timezone: str = DEFAULT_TIMEZONE,
) -> LakeTable:
    raw = read_cycler_csv(spark, [file])
    kind = classify_file(raw)
    out = normalize_cycler_data(raw, timezone=timezone, file_meta=file_meta)
    make = detect_source(raw.columns)
    if LakeTable.exists(table_path):
        table = LakeTable.load(spark, table_path)
    else:
        table = LakeTable.create(
            spark, table_path, out.schema, num_buckets=8, bucket_key="cycle",
            properties={"quick_mode": True, "source_kind": kind, "make": make},
        )
    table.append(out)
    return table
