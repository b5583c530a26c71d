"""Window / aggregation / join-enrich family (SURVEY §2.5, Transformer.py:413-724).

Moved verbatim from __spark_entry__.py (round 5: the query surface split
by family so per-query driver plan-build cost attributes to one module).
Each docstring cites its reference analog file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from battetl_spark.queries._shared import _t


def q_running_cumsum(spark, sf):
    """A3: cumulative value over ordered frame per key (cumulative-capacity
    pattern, Transformer.py:614-724)."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("cum_value"),
    )


def q_lag_delta(spark, sf):
    """A5: per-sample deltas via lag + conditional per-key sums (CC/CV split
    pattern, Transformer.py:704-719)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.withColumn("delta", F.col("value") - F.lag("value").over(w))
    return d.groupBy("user_id").agg(
        F.round(F.sum(F.when(F.col("delta") > 0, F.col("delta"))), 6).alias(
            "sum_pos_delta"
        ),
        F.count(F.when(F.col("delta") < 0, 1)).alias("n_neg_delta"),
    )


def q_fractional_crossing(spark, sf):
    """A6: first position where the running total crosses 50% of the final
    (50%/80% charge-time pattern, Transformer.py:536-551)."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("user_id")
    d = ev.select(
        "user_id",
        "event_id",
        F.sum("value").over(w).alias("cum"),
        F.sum("value").over(tot).alias("total"),
    )
    return d.groupBy("user_id").agg(
        F.min(
            F.when(F.col("cum") >= 0.5 * F.col("total"), F.col("event_id"))
        ).alias("half_crossing_event_id")
    )


def q_first_last(spark, sf):
    """O4/J5: first/last row per key by order (reference Loader.py:1259-1277
    ORDER BY ... LIMIT 1 scalar subqueries)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
    )


def q_user_rollup(spark, sf):
    """Conversation-stats analog (SURVEY §7.9): per-key counts per class,
    last payload, totals — one shuffle, partial-agg friendly."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchase"
        ),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def q_groupby_agg(spark, sf):
    """A1/A10: TPC-H-Q1-style grouped aggregate on lineitem."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_join_enrich(spark, sf):
    """J1: fact ⋈ broadcast dim + grouped rollup (reference pandas join
    Transformer.py:479-483)."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_sorted_topk(spark, sf):
    """O1/O6: deterministic top-k (value desc, id asc tiebreak)."""
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
        .limit(100)
    )


def q_union_distinct(spark, sf):
    """E1: multi-source union + distinct (reference concat
    Extractor.py:716-736)."""
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.unionByName(b).distinct()
