"""Sequence packing: distributed two-pass prefix sum vs hashlib ground truth.

Pins: exact span layout vs an independent pandas/hashlib replay, token
conservation per doc and per chunk, shard-count independence (the global
order must not depend on how the prefix sum is sharded), seed sensitivity,
and the plan shape (one corpus-side Exchange; broadcast base-offset join).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from battetl_spark.analytics.packing import pack_documents
from tests.conftest import assert_pdf_equal

pytestmark = pytest.mark.textops

L = 64


def _toks(text) -> int:
    """Engine token_count semantics: split(trim, \\s+) — a whitespace-only
    doc yields [''] = 1 token (matches the DuckDB oracle exactly)."""
    return len(re.split(r"\s+", str(text).strip()))


def _key(doc_id: int, seed: int = 0) -> int:
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
    return int(h[:13], 16)


def _ground_truth(pdf: pd.DataFrame, seq_len: int, seed: int = 0) -> pd.DataFrame:
    rows = []
    docs = [
        (int(r.doc_id), _toks(r.text)) for r in pdf.itertuples(index=False)
    ]
    docs = [(d, n) for d, n in docs if n > 0]
    docs.sort(key=lambda dn: (_key(dn[0], seed), dn[0]))
    off = 0
    for doc_id, n in docs:
        for chunk in range(off // seq_len, (off + n - 1) // seq_len + 1):
            lo, hi = chunk * seq_len, (chunk + 1) * seq_len
            rows.append(
                {
                    "chunk_id": chunk,
                    "doc_id": doc_id,
                    "start_in_doc": max(0, lo - off),
                    "start_in_chunk": max(0, off - lo),
                    "n_toks": min(hi, off + n) - max(lo, off),
                }
            )
        off += n
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs_pdf():
    import numpy as np

    rng = np.random.default_rng(5)
    words = ["alpha", "bravo", "charlie", "delta", "echo"]
    rows = []
    for i in range(300):
        n = int(rng.integers(1, 200))  # many docs longer than L=64
        rows.append({"doc_id": i, "text": " ".join(rng.choice(words, n))})
    rows.append({"doc_id": 300, "text": " ".join(["giant"] * 1000)})  # 15+ chunks
    rows.append({"doc_id": 301, "text": "   "})  # whitespace-only: counts 1
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs(spark, docs_pdf):
    return spark.createDataFrame(docs_pdf)


def test_pack_matches_ground_truth(docs, docs_pdf):
    got = pack_documents(docs, L, num_shards=7).toPandas()
    exp = _ground_truth(docs_pdf, L)
    assert_pdf_equal(got, exp, sort_cols=["chunk_id", "doc_id", "start_in_doc"])


def test_shard_count_independence(docs):
    a = pack_documents(docs, L, num_shards=1).toPandas()
    b = pack_documents(docs, L, num_shards=64).toPandas()
    cols = ["chunk_id", "doc_id", "start_in_doc"]
    assert_pdf_equal(a, b, sort_cols=cols)


def test_token_conservation(docs, docs_pdf):
    got = pack_documents(docs, L).toPandas()
    # per doc: spans sum to the doc's token count
    toks = {
        int(r.doc_id): _toks(r.text) for r in docs_pdf.itertuples(index=False)
    }
    per_doc = got.groupby("doc_id")["n_toks"].sum()
    for d, s in per_doc.items():
        assert s == toks[int(d)]
    # per chunk: every chunk is exactly full except the last
    per_chunk = got.groupby("chunk_id")["n_toks"].sum().sort_index()
    assert (per_chunk.iloc[:-1] == L).all()
    assert 0 < per_chunk.iloc[-1] <= L
    # chunk ids are contiguous from 0
    assert per_chunk.index.tolist() == list(range(len(per_chunk)))


def test_seed_changes_layout(docs):
    a = pack_documents(docs, L, seed=0).toPandas()
    b = pack_documents(docs, L, seed=1).toPandas()
    ka = a.sort_values(["chunk_id", "start_in_chunk"])["doc_id"].tolist()
    kb = b.sort_values(["chunk_id", "start_in_chunk"])["doc_id"].tolist()
    assert ka != kb


def test_pack_plan_shape(docs):
    plan = (
        pack_documents(docs, L)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # base offsets join the corpus via broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # corpus-side shuffles: the shard window's hash Exchange (the totals agg
    # reuses the same partial-agg shape); plus the tiny #shards-row window's
    # single partition. No more.
    assert plan.count("Exchange hashpartitioning") <= 2


def test_materialize_chunks_roundtrip(docs, docs_pdf):
    """Materialized chunks concatenate back to exactly the corpus token
    stream in the deterministic shuffle order."""
    from battetl_spark.analytics.packing import materialize_chunks, pack_documents

    out = (
        materialize_chunks(docs, pack_documents(docs, L, num_shards=5))
        .orderBy("chunk_id")
        .toPandas()
    )
    # chunk sizes: all full except the final chunk
    sizes = out["n_toks"].tolist()
    assert all(s == L for s in sizes[:-1]) and 0 < sizes[-1] <= L
    assert all(len(t) == s for t, s in zip(out["tokens"], sizes))
    got_stream = [w for t in out["tokens"] for w in t]
    order = sorted(
        ((int(r.doc_id), _toks(r.text)) for r in docs_pdf.itertuples(index=False)),
        key=lambda dn: (_key(dn[0]), dn[0]),
    )
    texts = {int(r.doc_id): str(r.text) for r in docs_pdf.itertuples(index=False)}
    exp_stream = [
        w for d, _ in order for w in re.split(r"\s+", texts[d].strip())
    ]
    assert got_stream == exp_stream
