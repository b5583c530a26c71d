"""Relational operators Spark lacks as built-ins, composed from DataFrame
primitives (per the build brief: composition first, pandas fallback never
needed here — all pure Catalyst).

- ``asof_join``: for each left row, the latest right row with
  right.order <= left.order per key. Implemented as union + forward-fill
  (last non-null over an ordered window) — ONE shuffle on (key), no
  cross/inequality join. This is the standard log-structured as-of idiom:
  at 100 TB both sides shuffle once by key and stream through a window,
  vs a per-row range probe.
- ``range_join_count``: per left row, count right rows within a bounded
  interval before it. Equi-join on key + interval predicate; the bound keeps
  the join selective (Catalyst pushes the range predicate into the join).
- ``time_bucket_rollup``: hypertable-style time_bucket aggregation —
  date_trunc + groupBy, partial-agg friendly.
- ``sessionize``: gap-based sessions via lag + running sum of
  session-starts — the windowed sessionization idiom (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows enriched with the latest right row at-or-before them.

    Both inputs must share ``key_cols`` and ``order_col``. Right's
    ``value_cols`` appear as ``<name><suffix>`` (NULL when no prior right
    row, or when the match is older than ``tolerance`` in order units).
    """
    l_tag = left.select(
        *key_cols, order_col, *[c for c in left.columns if c not in key_cols + [order_col]],
        F.lit(1).alias("__is_left"),
    )
    r_tag = right.select(
        *key_cols,
        order_col,
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(0).alias("__is_left"),
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal order value → a right row at
    # exactly left.order IS visible to that left row (<= semantics)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__is_left") == 0, F.col(order_col)), ignorenulls=True
        ).over(w).alias("__right_order"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    within = (
        F.lit(True)
        if tolerance is None
        else (F.col(order_col) - F.col("__right_order")) <= F.lit(tolerance)
    )
    out = out.select(
        *[c for c in left.columns],
        *[
            F.when(F.col("__right_order").isNotNull() & within, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    order_col: str,
    lower: float,
    upper: float,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count of right rows with
    left.order - upper <= right.order < left.order - lower (same key)."""
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for k in key_cols:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lo = F.col(f"l.{order_col}") - F.lit(upper)
    hi = F.col(f"l.{order_col}") - F.lit(lower)
    joined = l.join(
        r, cond & (F.col(f"r.{order_col}") >= lo) & (F.col(f"r.{order_col}") < hi),
        "left",
    )
    return joined.groupBy(*[F.col(f"l.{c}") for c in left.columns]).agg(
        F.count(F.col(f"r.{order_col}")).alias(count_alias)
    )


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    bucket: str = "hour",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Hypertable-style rollup: date_trunc(bucket) + groupBy."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n")]
    return (
        df.withColumn("__bucket_ts", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy("__bucket_ts", *group_cols)
        .agg(*aggs)
        .withColumnRenamed("__bucket_ts", "bucket_ts")
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Gap-based session ids per key: a new session starts when the time
    since the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (0-based per key, ordered by time)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", F.sum(new_sess).over(run) - 1)


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """Cohort retention: each user's cohort is the ``period`` (day|week) of
    their FIRST event; for every (cohort, offset) cell, how many of that
    cohort's users were active ``offset`` periods later.

    Returns ``cohort_<period> (date), offset_<period>s (int), n_users,
    cohort_size`` — one row per non-empty cell (offset 0 always exists and
    equals ``cohort_size``).

    Scale shape: (1) distinct (user, period) activity — ONE shuffle on the
    pair, partial-aggregated map-side so a user with 10^6 events in a day
    combines before the exchange; (2) per-user min → cohort — shuffle on
    user; (3) activity ⋈ cohort is co-partitioned on the same user key;
    (4) the (cohort, offset) grid aggregate counts rows (the input is
    already user-distinct — never a count-distinct); (5) cohort sizes are
    the grid's own offset-0 slice, broadcast back. No window over raw
    events, nothing driver-side; the grid is bounded by days², not rows.

    Reference analog: none (no behavioral analytics in the reference ETL);
    events-table analytics family of the build brief, completing the
    sessionize → funnel → retention trio.
    """
    if period not in ("day", "week"):
        raise ValueError(f"period must be 'day' or 'week', got {period!r}")
    act = (
        events.select(
            F.col(user_col).alias("__u"),
            F.date_trunc(period, F.col(ts_col)).alias("__p"),
        )
        .distinct()
    )
    coh = act.groupBy("__u").agg(F.min("__p").alias("__c"))
    days = F.datediff(F.to_date("__p"), F.to_date("__c"))
    # date_trunc aligns both endpoints to the period start, so the day gap
    # is exactly divisible for week — integer division, no rounding
    offset = (days / 7).cast("int") if period == "week" else days.cast("int")
    grid = (
        act.join(coh, "__u")
        .groupBy(F.col("__c"), offset.alias("__off"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    sizes = grid.filter(F.col("__off") == 0).select(
        "__c", F.col("n_users").alias("cohort_size")
    )
    return grid.join(F.broadcast(sizes), "__c").select(
        F.to_date("__c").alias(f"cohort_{period}"),
        F.col("__off").alias(f"offset_{period}s"),
        "n_users",
        "cohort_size",
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    horizon_s: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_unix",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest completion chain
    ``steps[0] < steps[1] < ...`` (strictly increasing ``ts_col``), anchored
    at the user's EARLIEST occurrence of ``steps[0]``; ``horizon_s`` bounds
    every later step to ``t1 + horizon_s`` (standard anchored-window funnel
    — a later, faster restart of step 1 is not considered; documented).

    Returns one row per user who reached step 1: ``user, depth,
    t_1..t_len(steps)`` (NULL past ``depth``). Greedy-earliest equals
    min-after-previous, so the whole funnel is len(steps) chained
    min-aggregates joined on the user key — every shuffle is on the same
    key (co-partitioned, AQE-coalesced), partial-aggregated map-side, and
    the events frame is filtered to the step types first (isin pushes to
    the scan). No per-user event collection, no window over raw events.

    Reference analog: none (no behavioral analytics in the reference ETL);
    events-table analytics family of the build brief.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    e = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u"), F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    cur = (
        e.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("t_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = e.filter(F.col("__t") == s).select(
            "__u", F.col("__ts").alias("__cand")
        )
        cond = F.col("__cand") > F.col(f"t_{i - 1}")
        if horizon_s is not None:
            cond = cond & (F.col("__cand") <= F.col("t_1") + F.lit(horizon_s))
        step_t = (
            nxt.join(cur.select("__u", "t_1", f"t_{i - 1}"), "__u")
            .filter(cond)
            .groupBy("__u")
            .agg(F.min("__cand").alias(f"t_{i}"))
        )
        cur = cur.join(step_t, "__u", "left")
    depth = sum(
        (F.col(f"t_{i}").isNotNull().cast("int") for i in range(2, len(steps) + 1)),
        F.lit(1),
    )
    return cur.select(
        F.col("__u").alias(user_col),
        depth.cast("int").alias("depth"),
        *[F.col(f"t_{i}") for i in range(1, len(steps) + 1)],
    )


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` — ``p<q*100>`` columns plus
    ``n``.

    Exact mode (default) computes the DISCRETE (higher-tie) quantile: the
    smallest data value whose ``cume_dist >= q``. Picking an actual element
    (never interpolating between two) keeps the result reproducible across
    engines bit-for-bit — interpolation formulas differ in their last-ulp
    float rounding between implementations; ``cume_dist`` is an exact
    rational. Cost shape: ONE per-group sort window (the honest cost of
    exact order statistics — partitioned by group, so no global sort and no
    hot key unless one group dominates) + one partial-aggregated groupBy.

    ``approx=True`` is the 100-TB path: Spark's ``percentile_approx``
    (t-digest-style mergeable sketch, no sort, partial-aggregated) with the
    same output shape — documented rank error instead of exactness, so it
    is NOT oracle-checked.

    Reference analog: none (no distribution profiling in the reference
    ETL); data-profiling family of the build brief.
    """
    if not qs:
        raise ValueError("qs must be non-empty")

    def name(q):
        pct = q * 100
        return f"p{pct:g}".replace(".", "_")

    if approx:
        return df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.percentile_approx(value_col, q).alias(name(q))
                for q in qs
            ],
        )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    base = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.cume_dist().over(w).alias("__cd"),
    )
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.min(F.when(F.col("__cd") >= q, F.col("__v"))).alias(name(q))
            for q in qs
        ],
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    approx: bool = False,
) -> DataFrame:
    """Sliding-window distinct actives (DAU/WAU/MAU family): for every
    observation day, how many distinct users were active in the trailing
    ``window_days`` days. Returns ``day (date), active_users``.

    Exact distributed shape — no per-day count-distinct over raw events:
    (1) distinct (user, day) activity (ONE partial-aggregated pair
    shuffle); (2) each active day contributes to the ``window_days``
    observation days it covers — a map-side explode of a constant 0..W-1
    sequence, W× a user-day-distinct frame, not W× raw events; (3) the
    observation-day bound (a one-row max) broadcasts back; (4) ONE more
    distinct-pair shuffle on (obs_day, user) absorbs users active several
    times inside a window, and the final count groups already-distinct
    pairs. Window growth costs map-side fanout only — the W=30 MAU runs
    the same two shuffles.

    ``approx=True`` is the sketch path for when even the user-day-distinct
    frame is too hot: ONE Datasketches HLL sketch per active day (a
    mergeable fixed-size binary, built with a single partial-aggregated
    pass over raw events — no distinct at all), then the W-day fanout
    moves only #days × sketch-bytes and ``hll_union_agg`` merges per
    observation day. Documented ~2% relative error; NOT oracle-checked.

    Reference analog: none; events-table analytics family of the build
    brief.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    if approx:
        daily = (
            events.select(F.col(user_col).alias("__u"), day.alias("__d"))
            .groupBy("__d")
            .agg(F.hll_sketch_agg("__u").alias("__sk"))
        )
        hi = daily.agg(F.max("__d").alias("__hi"))
        contrib = daily.select(
            "__sk", "__d",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(window_days) - 1))
            ).alias("__i"),
        ).select("__sk", F.expr("date_add(__d, __i)").alias("__od"))
        return (
            contrib.join(F.broadcast(hi))
            .filter(F.col("__od") <= F.col("__hi"))
            .groupBy("__od")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("__sk"))
                .cast("long")
                .alias("active_users")
            )
            .select(F.col("__od").alias("day"), "active_users")
        )
    act = (
        events.select(F.col(user_col).alias("__u"), day.alias("__d"))
        .distinct()
    )
    hi = act.agg(F.max("__d").alias("__hi"))
    contrib = act.select(
        "__u", "__d",
        F.explode(F.sequence(F.lit(0), F.lit(int(window_days) - 1))).alias("__i"),
    ).select("__u", F.expr("date_add(__d, __i)").alias("__od"))
    return (
        contrib.join(F.broadcast(hi))
        .filter(F.col("__od") <= F.col("__hi"))
        .select("__od", "__u")
        .distinct()
        .groupBy("__od")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
        .select(F.col("__od").alias("day"), "active_users")
    )
