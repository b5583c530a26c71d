from battetl_spark.streaming.log_source import (  # noqa: F401
    FilePartitionedLog,
    change_events_to_kafka,
    kafka_to_change_events,
)
from battetl_spark.streaming.pipeline import (  # noqa: F401
    CdcStream,
    read_change_event_stream,
    windowed_metrics_stream,
)
