from battetl_spark.lake.table import LakeTable, SchemaCompatibilityError  # noqa: F401
from battetl_spark.lake.evolution import check_schema_compatibility  # noqa: F401
