from battetl_spark.streaming.log_source import FilePartitionedLog  # noqa: F401
from battetl_spark.streaming.pipeline import (  # noqa: F401
    CdcStream,
    read_change_event_stream,
    windowed_metrics_stream,
)
