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


def test_funnel_semantics(spark):
    """Anchored-window ordered funnel: earliest completion chain, strictly
    increasing, later steps bounded to t_1 + horizon; out-of-order or
    outside-window steps don't count; one row per user reaching step 1."""
    from battetl_spark.operators import funnel

    rows = [
        # u1: full clean funnel
        ("u1", "signup", 100), ("u1", "view", 200), ("u1", "purchase", 300),
        # u2: purchase BEFORE view -> depth 2 (order matters)
        ("u2", "signup", 100), ("u2", "purchase", 150), ("u2", "view", 200),
        # u3: view outside horizon -> depth 1
        ("u3", "signup", 100), ("u3", "view", 100 + 1000),
        # u4: no signup at all -> absent from output
        ("u4", "view", 100), ("u4", "purchase", 200),
        # u5: view at the SAME ts as signup must NOT count (strictly after);
        #     the later view does, purchase exactly at the horizon counts
        ("u5", "signup", 100), ("u5", "view", 100), ("u5", "view", 150),
        ("u5", "purchase", 600),
        # u6: two signups; anchor is the EARLIEST (documented), so the
        #     view within the second signup's window but past the first
        #     anchor's horizon does not count
        ("u6", "signup", 0), ("u6", "signup", 900), ("u6", "view", 950),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts_unix"])
    out = {
        r["user_id"]: (r["depth"], r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(
            ev, ["signup", "view", "purchase"], horizon_s=500
        ).collect()
    }
    assert out == {
        "u1": (3, 100, 200, 300),
        "u2": (2, 100, 200, None),
        "u3": (1, 100, None, None),
        "u5": (3, 100, 150, 600),
        "u6": (1, 0, None, None),
    }


def test_funnel_plan_shape(spark):
    """No window over raw events; the step-type isin reaches the scan
    filter; aggregates partial-combine map-side."""
    from battetl_spark.operators import funnel

    ev = spark.createDataFrame(
        [("u", "signup", 1)], ["user_id", "event_type", "ts_unix"]
    )
    plan = funnel(ev, ["signup", "view", "purchase"], horizon_s=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_retention_semantics(spark):
    """Cohort = first-activity day; cells count distinct users per offset;
    cohort_size joins back from the offset-0 slice; multiple events in one
    day collapse to one activity."""
    import datetime as dt

    from battetl_spark.operators import retention

    def t(day, hour=0):
        return dt.datetime(2026, 1, day, hour)

    rows = [
        # cohort 2026-01-01: u1 active d0, d1, d2; u2 active d0 and d2
        ("u1", t(1)), ("u1", t(1, 5)), ("u1", t(2)), ("u1", t(3)),
        ("u2", t(1, 23)), ("u2", t(3, 1)),
        # cohort 2026-01-02: u3 active d0 only
        ("u3", t(2, 12)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_day"].isoformat(), r["offset_days"]):
            (r["n_users"], r["cohort_size"])
        for r in retention(ev, period="day").collect()
    }
    assert out == {
        ("2026-01-01", 0): (2, 2),
        ("2026-01-01", 1): (1, 2),
        ("2026-01-01", 2): (2, 2),
        ("2026-01-02", 0): (1, 1),
    }


def test_retention_week_alignment(spark):
    """Weekly cohorts truncate to the week start, so the day gap is exactly
    divisible by 7 and offsets are whole weeks."""
    import datetime as dt

    from battetl_spark.operators import retention

    rows = [  # 2026-01-05 is a Monday
        ("u1", dt.datetime(2026, 1, 6)),     # week of Jan 5
        ("u1", dt.datetime(2026, 1, 18)),    # Sunday of the NEXT week (+1)
        ("u1", dt.datetime(2026, 1, 19)),    # Monday two weeks out (+2)
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        r["offset_weeks"]: r["n_users"]
        for r in retention(ev, period="week").collect()
    }
    assert out == {0: 1, 1: 1, 2: 1}


def test_frequent_ngrams_semantics(spark):
    """df counts distinct docs, occurrences counts every slot, the min_df
    threshold is a deterministic set cut; docs shorter than n contribute
    nothing; normalization lowercases and strips punctuation."""
    from battetl_spark.analytics.terms import frequent_ngrams

    docs = spark.createDataFrame(
        [
            (1, "the cat sat, the cat sat"),   # 'the cat' x2, 'cat sat' x2
            (2, "The CAT sat"),                # normalized same bigrams
            (3, "cat"),                        # 1 token -> no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {
        r["ngram"]: (r["df"], r["occurrences"])
        for r in frequent_ngrams(docs, n=2, min_df=2).collect()
    }
    assert out == {"the cat": (2, 3), "cat sat": (2, 3)}
    only_doc1 = frequent_ngrams(docs, n=2, min_df=1).collect()
    assert {r["ngram"] for r in only_doc1} == {
        "the cat", "cat sat", "sat the"
    }


def test_group_quantiles_exact_and_approx(spark):
    """Discrete higher-tie quantile: smallest value with cume_dist >= q;
    ties collapse to one peer group; approx mode keeps the output shape."""
    from battetl_spark.operators import group_quantiles

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    rows += [("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        r["g"]: (r["n"], r["p50"], r["p90"])
        for r in group_quantiles(df, ["g"], "v", [0.5, 0.9]).collect()
    }
    # a: cd(5)=0.5 -> p50=5; cd(9)=0.9 -> p90=9
    # b: ties at 5 share cd=0.75 >= 0.5 -> p50=5; p90 -> 9 (cd=1.0)
    assert out == {"a": (10, 5.0, 9.0), "b": (4, 5.0, 9.0)}
    ap = group_quantiles(df, ["g"], "v", [0.5], approx=True).collect()
    assert {r["g"] for r in ap} == {"a", "b"}
    assert all(r["p50"] is not None and r["n"] > 0 for r in ap)


def test_rolling_active_users_semantics(spark):
    """Window covers the trailing W days inclusive; a user active twice in
    one window counts once; observation days stop at the last active day."""
    import datetime as dt

    from battetl_spark.operators import rolling_active_users

    rows = [
        ("u1", dt.datetime(2026, 1, 1)),
        ("u1", dt.datetime(2026, 1, 1, 8)),   # same day, same user
        ("u2", dt.datetime(2026, 1, 2)),
        ("u1", dt.datetime(2026, 1, 4)),       # u1 again inside the window
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        r["day"].isoformat(): r["active_users"]
        for r in rolling_active_users(ev, window_days=3).collect()
    }
    # day: distinct users active in [day-2, day]
    assert out == {
        "2026-01-01": 1,          # u1
        "2026-01-02": 2,          # u1, u2
        "2026-01-03": 2,          # u1(1st), u2
        "2026-01-04": 2,          # u2, u1(4th) — u1 counted once
    }


def test_rolling_active_users_approx_close_to_exact(spark):
    """The HLL sketch path (one mergeable sketch per day, W-day fanout of
    sketch bytes, hll_union_agg per observation day) tracks the exact
    distinct counts within the documented relative error."""
    import datetime as dt

    from battetl_spark.operators import rolling_active_users

    rows = [
        (f"u{i % 97}", dt.datetime(2026, 1, 1 + (i % 10), i % 24))
        for i in range(2000)
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    exact = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    approx = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(ev, window_days=7, approx=True).collect()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(2, 0.05 * n), (d, n, approx[d])
