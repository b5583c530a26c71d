from battetl_spark.analytics.cycle_stats import calc_cycle_stats  # noqa: F401
from battetl_spark.analytics.rollups import conversation_stats  # noqa: F401
from battetl_spark.analytics.cache import cache_scope  # noqa: F401
from battetl_spark.analytics.sig_index import MinHashIndex  # noqa: F401
from battetl_spark.analytics.sig_index import SimHashIndex  # noqa: F401
from battetl_spark.analytics.sig_index import EmbeddingIndex  # noqa: F401
from battetl_spark.analytics.clean_stream import (  # noqa: F401
    CleanerStream,
    IncrementalCorpusCleaner,
    read_document_stream,
)
from battetl_spark.analytics.sig_index import NgramIndex  # noqa: F401
