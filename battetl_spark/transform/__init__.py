from battetl_spark.transform.normalize import (  # noqa: F401
    detect_source,
    normalize_cycler_data,
    user_transform_hook,
)
