"""Structured Streaming drive of the incremental corpus cleaner: a
drop-folder of document parquet files tailed with readStream, each
microbatch cleaned incrementally (out-of-order mode — file discovery order
is NOT id order) through the fenced CDC merge. Final state must equal the
batch ``clean_corpus`` answer, including across a crash/restart from
checkpoint at the worst point (state committed, checkpoint not acked)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from battetl_spark.analytics import (
    CleanerStream,
    IncrementalCorpusCleaner,
    read_document_stream,
)
from battetl_spark.analytics import textops as TX

pytestmark = pytest.mark.streaming

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


@pytest.fixture(scope="module")
def expected(docs):
    return (
        TX.clean_corpus(docs, min_quality=0.5, langs=("en", "de"))
        .orderBy("doc_id").toPandas().reset_index(drop=True)
    )


def write_residue_files(docs, path):
    # one file per mod-3 residue class — a discovery order of (2, 0, 1)
    # or any other permutation is fine: the ordered=False cleaner owes the
    # same final state for ANY batch order
    for r in (2, 0, 1):
        (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == r)
            .coalesce(1).write.mode("append").parquet(path)
        )


def cleaned(cl):
    return cl.result().orderBy("doc_id").toPandas().reset_index(drop=True)


def test_cleaner_stream_matches_batch(spark, tmp_path, docs, expected):
    src = str(tmp_path / "drop")
    write_residue_files(docs, src)
    cl = IncrementalCorpusCleaner.create(
        spark, str(tmp_path / "cleaner"),
        min_quality=0.5, langs=("en", "de"), ordered=False,
    )
    seen = []
    stream = CleanerStream(
        cl, str(tmp_path / "ckpt"), on_batch=lambda e, r: seen.append((e, r))
    )
    stream.run_to_completion(read_document_stream(spark, src))
    assert len(seen) == 3  # one microbatch per file
    assert sum(r["seen"] for _, r in seen) == docs.count()
    assert cleaned(cl).equals(expected)


def test_cleaner_stream_crash_resume_from_checkpoint(
    spark, tmp_path, docs, expected
):
    src = str(tmp_path / "drop")
    write_residue_files(docs, src)
    cl = IncrementalCorpusCleaner.create(
        spark, str(tmp_path / "cleaner"),
        min_quality=0.5, langs=("en", "de"), ordered=False,
    )
    ckpt = str(tmp_path / "ckpt")

    crashed = {"done": False}

    def injector(epoch_id, phase):
        # worst point: cleaner state fully committed (indexes + fenced
        # merge + watermark), checkpoint NOT acked — the restart must
        # replay the epoch into a converged no-op
        if epoch_id == 1 and phase == "after_add" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after epoch 1")

    stream = CleanerStream(cl, ckpt, fail_injector=injector)
    with pytest.raises(Exception):
        stream.run_to_completion(read_document_stream(spark, src))
    assert crashed["done"]
    assert cl.out.has_fence(1)  # epoch 1 landed before the crash

    cl2 = IncrementalCorpusCleaner.open(spark, str(tmp_path / "cleaner"))
    stream2 = CleanerStream(cl2, ckpt)
    stream2.run_to_completion(read_document_stream(spark, src))
    assert cleaned(cl2).equals(expected)


def test_cleaner_stream_maintenance_bounds_state(
    spark, tmp_path, docs, expected
):
    """A long-running cleaner stream must not accrete unbounded state: each
    of the cleaner's three tables gains one file per touched bucket per
    batch and the output fence map one entry per epoch. Six microbatches
    with aggressive auto-compaction must keep every bucket at the fold
    threshold, keep the fence map folded into its floor — and change
    nothing about the answer."""
    src = str(tmp_path / "drop")
    for r in range(6):
        (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(6)) == r)
            .coalesce(1).write.mode("append").parquet(src)
        )
    cl = IncrementalCorpusCleaner.create(
        spark, str(tmp_path / "cleaner"),
        min_quality=0.5, langs=("en", "de"), ordered=False, num_buckets=4,
    )
    stream = CleanerStream(
        cl, str(tmp_path / "ckpt"),
        auto_compact_files=2, auto_compact_fences_every=2,
    )
    stream.run_to_completion(read_document_stream(spark, src))

    for t in (cl.out, cl.digests, cl.sig.table):
        files = t.snapshot()["files"]
        assert max((len(v) for v in files.values()), default=0) <= 2
    assert cl.out.fence_floor() >= 3  # folded at epochs 0/2/4
    assert len(cl.out.fences()) <= 2
    assert cleaned(cl).equals(expected)
