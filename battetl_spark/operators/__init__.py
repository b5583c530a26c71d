from battetl_spark.operators.relational import (  # noqa: F401
    asof_join,
    funnel,
    group_quantiles,
    range_join_count,
    retention,
    rolling_active_users,
    sessionize,
    time_bucket_rollup,
)
