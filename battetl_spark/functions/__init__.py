from battetl_spark.functions.core import (  # noqa: F401
    interval_to_seconds,
    pack_other_details,
    parse_datetime_multi,
    strip_thousands,
    to_milli,
    to_utc,
    unixtime_s,
)
