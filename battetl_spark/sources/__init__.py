from battetl_spark.sources.cycler_csv import read_cycler_csv, sniff_layout  # noqa: F401
