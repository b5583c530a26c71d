"""BattEtl — the reference's extract().transform().load() facade, Spark-first
(reference battetl/BattETL.py:12-201; lifecycle SURVEY.md §3.1).

Same user-facing shape, different execution model: each stage composes ONE
lazy Catalyst plan; nothing materializes until load() writes to the LakeTable
(vs the reference's eager per-file pandas). The watermark/overwrite load
semantics (U1/U2) are the fenced LWW merge.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from battetl_spark.analytics.cycle_stats import calc_cycle_stats
from battetl_spark.lake import LakeTable
from battetl_spark.sources.cycler_csv import read_cycler_csv
from battetl_spark.sources.schedule import schedule_from_files
from battetl_spark.transform.normalize import (
    DEFAULT_TIMEZONE,
    normalize_cycler_data,
    user_transform_hook,
)

REQUIRED_CONFIG_KEYS = ("data_file_path",)  # U7-style config validation


def validate_config(config: dict) -> dict:
    missing = [k for k in REQUIRED_CONFIG_KEYS if k not in config]
    if missing:
        raise ValueError(f"config missing required keys: {missing}")
    if not isinstance(config["data_file_path"], (list, tuple)):
        raise ValueError("data_file_path must be a list of paths")
    return config


@dataclass
class BattEtl:
    """config keys (mirroring reference demo_config.json shape):
    data_file_path [required], schedule_file_path, timezone, file_meta,
    cv_voltage_threshold_mv, thermocouple, table_path."""

    spark: SparkSession
    config: dict
    user_transform_test_data: Callable[[pd.DataFrame], pd.DataFrame] | None = None
    test_data: DataFrame | None = None
    cycle_stats: DataFrame | None = None
    steps: dict = field(default_factory=lambda: {"chg": [], "dsg": [], "rst": []})

    def __post_init__(self):
        validate_config(self.config)

    def extract(self) -> "BattEtl":
        self.raw = read_cycler_csv(self.spark, self.config["data_file_path"])
        sched_paths = self.config.get("schedule_file_path") or []
        if sched_paths:
            _, self.steps = schedule_from_files(sched_paths)
        return self

    def transform(self) -> "BattEtl":
        df = normalize_cycler_data(
            self.raw,
            timezone=self.config.get("timezone", DEFAULT_TIMEZONE),
            file_meta=self.config.get("file_meta"),
        )
        # O1: stable sort by time then step (reference utils.py:283-305)
        df = df.orderBy("unixtime_s", "step") if "unixtime_s" in df.columns else df
        if self.user_transform_test_data is not None:
            df = user_transform_hook(df, self.user_transform_test_data)
        self.test_data = df
        if self.steps["chg"] or self.steps["dsg"]:
            self.cycle_stats = calc_cycle_stats(
                df,
                chg_steps=self.steps["chg"],
                dsg_steps=self.steps["dsg"],
                cv_voltage_threshold_mv=self.config.get("cv_voltage_threshold_mv"),
                thermocouple=self.config.get("thermocouple"),
            ).orderBy("cycle")  # O2 presentation ordering lives at the facade
        return self

    def save_transformed(self, path: str | None = None) -> str:
        """Persist the transformed frame as a parquet artifact so a later
        load-only run (`-l`, reference battetl/__init__.py:53,71-72) can
        re-load it without re-running extract/transform. One distributed
        write; the artifact carries the exact post-transform schema."""
        path = path or self.config.get("transformed_artifact_path") or (
            self.config["table_path"] + "_transformed"
        )
        self.test_data.write.mode("overwrite").parquet(path)
        return path

    def load_from_artifact(
        self, path: str | None = None, table: LakeTable | None = None
    ) -> "BattEtl":
        """Load-only stage: read a saved transformed artifact and run just
        the load path (reference `-l` semantics — load without re-extract)."""
        path = path or self.config.get("transformed_artifact_path") or (
            self.config["table_path"] + "_transformed"
        )
        self.test_data = self.spark.read.parquet(path)
        return self.load(table)

    def load(self, table: LakeTable | None = None) -> "BattEtl":
        """Append test_data to the target LakeTable (atomic snapshot commit).
        Watermark dedup across re-loads comes from the CDC merge path when a
        lsn-carrying source is used; plain file loads append."""
        if table is None:
            from battetl_spark.lake.table import LakeTable as LT

            path = self.config["table_path"]
            if LT.exists(path):
                table = LT.load(self.spark, path)
            else:
                table = LT.create(
                    self.spark, path, self.test_data.schema,
                    num_buckets=int(self.config.get("num_buckets", 16)),
                    bucket_key=self.config.get("bucket_key", "cycle"),
                )
        table.append(self.test_data.withColumn(
            "cycle", F.coalesce(F.col("cycle"), F.lit(0))
        ) if "cycle" in self.test_data.columns else self.test_data)
        self._table = table
        return self
