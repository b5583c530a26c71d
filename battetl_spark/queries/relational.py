"""Composed relational operators (as-of join, range join, rollup, sessionize).

Moved verbatim from __spark_entry__.py (round 5: the query surface split
by family so per-query driver plan-build cost attributes to one module).
Each docstring cites its reference analog file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from battetl_spark.queries._shared import _t


def q_asof_join(spark, sf):
    """As-of join: each purchase enriched with the latest prior view's value
    per user (log-structured union+forward-fill idiom, one shuffle)."""
    from battetl_spark.operators import asof_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.round("value", 6).alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.round("value", 6).alias("value")
    )
    out = asof_join(purchases, views, ["user_id"], "event_id", ["value"])
    return out.select(
        "user_id", "event_id", "purchase_value",
        F.round("value_asof", 6).alias("value_asof"),
    )


def q_range_join_count(spark, sf):
    """Range join: views within the 1000 event-ids before each purchase."""
    from battetl_spark.operators import range_join_count

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id")
    return range_join_count(purchases, views, ["user_id"], "event_id", 0, 1000)


def q_time_bucket_rollup(spark, sf):
    """Hypertable rollup: hourly buckets per event_type."""
    from battetl_spark.operators import time_bucket_rollup

    ev = _t(spark, sf, "events")
    return time_bucket_rollup(
        ev, "ts", "hour", ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")],
    )


def q_sessionize(spark, sf):
    """Gap-based sessionization (1h gap) → sessions per user."""
    from battetl_spark.operators import sessionize

    ev = _t(spark, sf, "events")
    s = sessionize(ev, ["user_id"], "ts", 3600.0)
    return s.groupBy("user_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


FUNNEL_STEPS = ["signup", "view", "purchase"]
FUNNEL_HORIZON_S = 7 * 24 * 3600


def q_event_funnel(spark, sf):
    """Anchored-window ordered funnel signup -> view -> purchase per user:
    len(steps) chained min-aggregates all keyed on user_id (co-partitioned,
    partial-aggregated; the step-type isin pushes to the parquet scan) —
    no per-user event collection, no raw-event window."""
    from battetl_spark.operators import funnel

    ev = _t(spark, sf, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").alias("ts_unix"),
    )
    return funnel(ev, FUNNEL_STEPS, horizon_s=FUNNEL_HORIZON_S)


def q_doc_corpus_profile(spark, sf):
    """Corpus mixture profile: doc counts and character mass for every
    (lang, source) combination PLUS all rollup margins in one pass —
    Spark's CUBE grouping sets (partial-aggregated; one shuffle regardless
    of how many grouping sets). gid disambiguates aggregated-out NULLs."""
    docs = _t(spark, sf, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .select("lang", "source", "gid", "n_docs", "chars")
    )


def q_event_retention(spark, sf):
    """Daily cohort retention over the events table: cohort = first-activity
    day per user; each (cohort_day, offset_days) cell counts that cohort's
    users active again offset days later, with the cohort size broadcast
    back from the grid's own offset-0 slice. Completes the sessionize →
    funnel → retention behavioral-analytics trio."""
    from battetl_spark.operators import retention

    r = retention(_t(spark, sf, "events"), period="day")
    # dates stringify with a time component on one engine's toPandas path;
    # emit the ISO day string so the value hash is representation-free
    return r.withColumn("cohort_day", F.date_format("cohort_day", "yyyy-MM-dd"))


QUANTILE_QS = [0.5, 0.95, 0.99]


def q_event_quantiles(spark, sf):
    """Exact per-event-type value quantiles (p50/p95/p99) — DISCRETE
    (higher-tie) quantiles via cume_dist, picking actual data values so
    the result is bit-identical cross-engine (interpolated percentiles
    differ in last-ulp rounding between implementations). One per-group
    sort window + one partial-aggregated groupBy; approx=True documented
    as the sketch-based 100-TB path."""
    from battetl_spark.operators import group_quantiles

    ev = _t(spark, sf, "events")
    out = group_quantiles(ev, ["event_type"], "value", QUANTILE_QS)
    return out.select(
        "event_type", "n",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        F.round("p99", 6).alias("p99"),
    )


ACTIVE_WINDOW_DAYS = 7


def q_event_active_users(spark, sf):
    """Trailing-7-day distinct active users per day (WAU curve): two
    distinct-pair shuffles + a broadcast bound — the window size costs
    map-side fanout only, never a per-day count-distinct over raw
    events."""
    from battetl_spark.operators import rolling_active_users

    out = rolling_active_users(
        _t(spark, sf, "events"), window_days=ACTIVE_WINDOW_DAYS
    )
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(spark, sf):
    """Per-user event-type PIVOT (counts per type as columns), realized as
    explicit conditional counts in ONE partial-aggregated groupBy — every
    cell folds map-side before the single Exchange. Deliberately NOT
    DataFrame.pivot(): even with explicit values it compiles to TWO
    aggregation passes (groupBy(user, type) count + pivotfirst, two
    Exchanges, plan read); known pivot values make the conditional form
    strictly better at scale. Plan-pinned single Exchange."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("long")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
