from battetl_spark.cdc.dedup import lww_winners  # noqa: F401
from battetl_spark.cdc.merge import MergeResult, delete_where, merge_apply  # noqa: F401
from battetl_spark.cdc.history import HistoryTable, history_rows  # noqa: F401
