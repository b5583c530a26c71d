from battetl_spark.streaming.pipeline import CdcStream, read_change_event_stream  # noqa: F401
