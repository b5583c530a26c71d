"""Scalar string/date/math family (SURVEY §2.8, battetl/utils.py converters).

Moved verbatim from __spark_entry__.py (round 5: the query surface split
by family so per-query driver plan-build cost attributes to one module).
Each docstring cites its reference analog file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from battetl_spark.queries._shared import _t


def q_unit_milli_scale(spark, sf):
    """P6: thousands-comma strip + ×1e3 unit scaling (utils.py:256-281).
    The comma string is synthesized then parsed back — exercises the real
    expression chain."""
    from battetl_spark.functions.core import to_milli

    ev = _t(spark, sf, "events")
    # synthesize a thousands-comma numeric string '<A>,<BBB>.25'
    pretty = F.concat(
        F.floor("value").cast("int").cast("string"),
        F.lit(","),
        F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0"),
        F.lit(".25"),
    )
    return ev.select(
        "event_id", F.round(to_milli(pretty), 2).alias("value_milli")
    )


def q_interval_parse(spark, sf):
    """P10/P11: '1d HH:MM:SS.f' interval → seconds (utils.py:307-330) —
    golden-style: synthesized interval strings, closed-form oracle."""
    from battetl_spark.functions.core import interval_to_seconds

    ev = _t(spark, sf, "events")
    s = F.concat(
        (F.col("user_id") % 3).cast("string"),
        F.lit("d 12:34:"),
        F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
    )
    return ev.select(
        "event_id",
        F.round(interval_to_seconds(s), 3).alias("interval_s"),
    )


def q_datetime_parse_roundtrip(spark, sf):
    """P7/P9: multi-format datetime fast-path + unixtime derivation
    (utils.py:361-399, Transformer.py:302-323)."""
    from battetl_spark.functions.core import parse_datetime_multi, unixtime_s

    ev = _t(spark, sf, "events")
    txt = F.when(
        F.col("event_id") % 2 == 0,
        F.date_format("ts", "MM/dd/yyyy HH:mm:ss"),
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    parsed = parse_datetime_multi(txt)
    return ev.select("event_id", unixtime_s(parsed).alias("unixtime_s"))


def q_tz_to_utc(spark, sf):
    """P8: localize naive timestamps to America/Los_Angeles then convert to
    UTC (utils.py:332-359); returned as epoch seconds."""
    from battetl_spark.functions.core import to_utc, unixtime_s

    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", unixtime_s(to_utc("ts")).alias("utc_unixtime_s")
    )


def q_json_extract(spark, sf):
    """P15-adjacent: JSON prop extraction + grouped stats over the open
    'props' column (reference other_details JSON, Loader.py:495-524)."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.when(k.isNull(), 1)).alias("n_null_k")
    )


def q_json_pack(spark, sf):
    """P15: leftover columns → JSON string with null stripping
    (Loader.py:495-524), native to_json."""
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_type"), F.col("user_id")),
        ).alias("other_details"),
    )
