"""battetl_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of BattGenie/battetl (reference at
/root/reference, studied in SURVEY.md) as an idiomatic Spark engine:

- ``battetl_spark.lake``      — snapshot-based parquet table format ("lakehouse
  lite"): atomic commits, bucketed copy-on-write MERGE, schema evolution,
  commit fencing for exactly-once (the Spark/lakehouse analog of the
  reference's Postgres Loader, reference battetl/load/Loader.py).
- ``battetl_spark.cdc``       — LSN-ordered last-writer-wins dedup, salted
  skew handling, batch + streaming merge-apply (reference analog:
  watermark append Loader.py:144-234, overwrite upsert Loader.py:236-332).
- ``battetl_spark.transform`` — vectorized source-schema normalization
  (rename maps, unit scaling, timestamp/UTC, interval parse) mirroring
  battetl/transform/Transformer.py as pure Catalyst column expressions.
- ``battetl_spark.analytics`` — per-group rollup engine (cycle-stats analog,
  Transformer.py:413-724) plus large-scale training-data ops: dedup
  (exact/minhash/simhash), similarity search, text quality/langid/tokens.
- ``battetl_spark.streaming`` — Structured Streaming wrapper with epoch
  fencing and checkpoint resume.
"""

__version__ = "0.1.0"

from battetl_spark.session import get_spark  # noqa: F401
