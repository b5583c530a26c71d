"""Scoped cache lifecycle for the near-dup / ANN operators.

The dedup and similarity operators persist derived signature frames (both
sides of their self-joins reference them; without a persist each side
recomputes the whole corpus pipeline). DataFrames are lazy, so the
operators themselves have no safe in-function unpersist point — the caller
materializes the results later. ``cache_scope()`` closes that gap for
long-lived sessions sweeping many corpora:

    with cache_scope():
        pairs = minhash_near_dup_pairs(docs).collect()
    # every signature frame persisted inside the scope is now unpersisted

Outside any scope the behavior is unchanged (frames stay cached until
``spark.catalog.clearCache()``), so one-shot query sessions — and the
driver's correctness gate — keep their warm-cache semantics.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_lock = threading.Lock()
_scope_stack: list[list[DataFrame]] = []


def track(df: DataFrame) -> DataFrame:
    """persist() a frame; if a cache_scope is active, register it for
    unpersist when the innermost scope exits."""
    df = df.persist()
    with _lock:
        if _scope_stack:
            _scope_stack[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope():
    """Unpersist every operator-persisted frame created inside the scope.
    Nestable; each scope releases only its own frames."""
    frames: list[DataFrame] = []
    with _lock:
        _scope_stack.append(frames)
    try:
        yield
    finally:
        with _lock:
            _scope_stack.remove(frames)
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
