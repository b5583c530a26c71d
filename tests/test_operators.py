"""Composed relational operators: semantics pinned on hand-built frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from battetl_spark.operators import (
    asof_join,
    range_join_count,
    sessionize,
    time_bucket_rollup,
)

pytestmark = pytest.mark.queries


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 5), ("b", 10)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("a", 7, 70.0), ("a", 10, 100.0), ("a", 20, 200.0), ("c", 1, 1.0)],
        ["k", "t", "v"],
    )
    out = {
        (r.k, r.t): r.v_asof
        for r in asof_join(left, right, ["k"], "t", ["v"]).collect()
    }
    assert out[("a", 10)] == 100.0  # exact-tie: right at same t IS visible
    assert out[("a", 25)] == 200.0  # latest prior
    assert out[("a", 5)] is None    # nothing at-or-before
    assert out[("b", 10)] is None   # key with no right rows


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("a", 100)], ["k", "t"])
    right = spark.createDataFrame([("a", 10, 1.0)], ["k", "t", "v"])
    ok = asof_join(left, right, ["k"], "t", ["v"], tolerance=200).collect()[0]
    stale = asof_join(left, right, ["k"], "t", ["v"], tolerance=50).collect()[0]
    assert ok.v_asof == 1.0 and stale.v_asof is None


def test_range_join_count(spark):
    left = spark.createDataFrame([("a", 100)], ["k", "t"])
    right = spark.createDataFrame(
        [("a", 99), ("a", 50), ("a", 100), ("a", -5), ("b", 99)], ["k", "t"]
    )
    # window [t-100, t): 99, 50 count; 100 (not < t), -5 (below), b (other key)
    out = range_join_count(left, right, ["k"], "t", 0, 100).collect()[0]
    assert out.n_in_range == 2


def test_time_bucket_rollup(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:05:00",), ("2024-01-01 10:55:00",), ("2024-01-01 11:01:00",)],
        ["s"],
    ).select(F.col("s").cast("timestamp").alias("ts"))
    out = time_bucket_rollup(df, "ts", "hour").orderBy("bucket_ts").collect()
    assert [r.n for r in out] == [2, 1]


def test_sessionize(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00"), ("u", "2024-01-01 10:30:00"),
         ("u", "2024-01-01 12:30:00"), ("u", "2024-01-01 12:40:00"),
         ("w", "2024-01-01 09:00:00")],
        ["k", "s"],
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    out = sessionize(df, ["k"], "ts", 3600.0)
    sess = {(r.k, str(r.ts)): r.session_id for r in out.collect()}
    assert sess[("u", "2024-01-01 10:00:00")] == 0
    assert sess[("u", "2024-01-01 10:30:00")] == 0
    assert sess[("u", "2024-01-01 12:30:00")] == 1  # 2h gap → new session
    assert sess[("u", "2024-01-01 12:40:00")] == 1
    assert sess[("w", "2024-01-01 09:00:00")] == 0
