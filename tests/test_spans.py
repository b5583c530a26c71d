"""Exact substring (k-token span) dedup — ground-truth and plan-shape tests.

Ground truth is an independent pure-Python re-implementation over a
hand-built corpus exercising every edge: sub-k docs (one partial span),
empty/whitespace-only text, within-doc-only repeats (must NOT count as
cross-doc duplicates), overlapping duplicate spans (coverage must union,
not sum), and fully-duplicated docs (everything stripped).
"""

from __future__ import annotations

import re

import pytest

from battetl_spark.analytics.spans import (
    cross_doc_dup_spans,
    span_dedup_stats,
    span_occurrences,
    strip_duplicated_spans,
)

pytestmark = pytest.mark.textops

K = 3

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog today"),
    (2, "Something else entirely but the quick brown fox jumps appears here"),
    (3, "unique text with no shared spans at all whatsoever"),
    (4, "short doc"),
    (5, "short doc"),  # whole-doc dup with 4 via the partial span
    (6, ""),
    (7, "   "),
    (8, "repeat repeat repeat repeat repeat"),  # self-repeat only
    (9, "aa bb cc dd ee ff gg aa bb cc"),
    (10, "zz yy aa bb cc dd xx ww"),  # overlapping shared spans with 9
]


def _norm(t):
    t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ")  # split('') == [''] — matches Spark's split


def _spans(w):
    n = max(len(w) - K + 1, 1)
    return [(" ".join(w[i : i + K]), i + 1) for i in range(n)]


def _ground_truth():
    seen: dict[str, set[int]] = {}
    for d, t in DOCS:
        for s, _ in _spans(_norm(t)):
            seen.setdefault(s, set()).add(d)
    dup = {s for s, ds in seen.items() if len(ds) >= 2}
    stats, clean = {}, {}
    for d, t in DOCS:
        w = _norm(t)
        sp = _spans(w)
        starts = [p for s, p in sp if s in dup]
        covered: set[int] = set()
        for p in starts:
            covered.update(range(p, min(p + K - 1, len(w)) + 1))
        kept = [w[i - 1] for i in range(1, len(w) + 1) if i not in covered]
        stats[d] = (
            len(w),
            len(sp),
            len(starts),
            len(covered),
            round(len(covered) / len(w), 6),
        )
        clean[d] = (" ".join(kept), len(kept))
    return stats, clean


def test_span_stats_match_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    exp, _ = _ground_truth()
    got = {
        r["doc_id"]: (
            r["n_toks"], r["n_spans"], r["n_dup_spans"],
            r["dup_tokens"], r["dup_frac"],
        )
        for r in span_dedup_stats(df, K).collect()
    }
    assert got == exp
    # the self-repeating single doc shares nothing cross-doc
    assert got[8][2] == 0
    # overlapping shared spans: coverage 7 < 2 spans * K=6+... (union, not sum)
    assert got[9][3] < got[9][2] * K


def test_strip_spans_match_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    _, exp = _ground_truth()
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in strip_duplicated_spans(df, K).collect()
    }
    assert got == exp
    # whole-doc duplicates strip to empty on BOTH sides (Lee et al. strips
    # every occurrence, it does not keep a canonical copy)
    assert got[4] == ("", 0) and got[5] == ("", 0)
    # untouched doc passes through with its normalization applied
    assert got[3][0] == " ".join(_norm(DOCS[2][1]))


def test_sub_k_docs_emit_one_partial_span(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    occ = span_occurrences(df, K)
    short = {r["doc_id"]: r for r in occ.filter("n_toks < 3").collect()}
    assert set(short) == {4, 5, 6, 7}
    assert all(r["pos"] == 1 for r in short.values())
    # empty and whitespace-only normalize to the same single token ''
    assert short[6]["span_h"] == short[7]["span_h"]
    dup = {r["span_h"] for r in cross_doc_dup_spans(occ).collect()}
    assert short[4]["span_h"] in dup and short[6]["span_h"] in dup


def test_strip_plan_has_no_per_token_reexpansion(spark):
    """The kept-token reassembly must reference the words array as a bound
    attribute, never inline the split/regexp chain into a lambda body
    (Catalyst re-evaluates such subtrees once per array element). The k
    shifted slices legitimately repeat the chain at PROJECTION level
    (per-row, the shingle-core pattern) — the trap's signature is the
    chain nested inside a lambdafunction."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = strip_duplicated_spans(df, K)._jdf.queryExecution().optimizedPlan().toString()
    assert not re.search(r"lambdafunction\([^)]*regexp_replace", plan)
    # static duplication stays O(k), not O(tokens)
    assert plan.count("regexp_replace") <= 14 * K


def test_span_incremental_equals_batch(spark):
    """SpanIndex family contract: union of per-batch outputs over ANY batch
    partitioning equals the batch operator's duplicate-occurrence set; each
    occurrence emitted exactly once; re-ingest anti-joins to a no-op."""
    import tempfile

    from pyspark.sql import functions as F

    from battetl_spark.analytics.sig_index import SpanIndex

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    occ = span_occurrences(df, K)
    dup = cross_doc_dup_spans(occ)
    exp = {
        (r["doc_id"], r["pos"])
        for r in occ.join(dup, "span_h", "leftsemi")
        .select("doc_id", "pos").collect()
    }
    for order in ([0, 1, 2], [2, 0, 1]):
        idx = SpanIndex.create(
            spark, tempfile.mkdtemp(prefix="spidx_") + "/i", span_k=K
        )
        got: set = set()
        for i in order:
            rows = [
                (r["doc_id"], r["pos"])
                for r in idx.add_batch(
                    df.filter(F.pmod("doc_id", F.lit(3)) == i)
                ).collect()
            ]
            assert len(rows) == len(set(rows))
            assert not (set(rows) & got)  # exactly-once across batches
            got |= set(rows)
        assert got == exp
        assert idx.add_batch(df).count() == 0  # re-ingest no-op


def test_span_index_back_emits_on_transition(spark):
    """A span held by a single indexed doc must back-emit that doc's stored
    occurrences when a LATER batch makes it cross-doc."""
    import tempfile

    from battetl_spark.analytics.sig_index import SpanIndex

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = SpanIndex.create(
        spark, tempfile.mkdtemp(prefix="spidx_") + "/i", span_k=K
    )
    assert idx.add_batch(df.filter("doc_id = 1")).count() == 0
    e2 = {(r["doc_id"], r["pos"]) for r in
          idx.add_batch(df.filter("doc_id = 2")).collect()}
    assert {d for d, _ in e2} == {1, 2}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab → dense collisions


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=2,
        max_size=10,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_span_ops_match_model_on_random_corpora(spark, corpus, k):
    """Property: stats AND strip agree with the pure-Python model on random
    low-entropy corpora (dense span collisions, many overlap merges)."""
    docs = [(i + 1, " ".join(ws)) for i, ws in enumerate(corpus)]
    seen: dict[str, set[int]] = {}

    def spans_of(w):
        n = max(len(w) - k + 1, 1)
        return [(" ".join(w[i:i + k]), i + 1) for i in range(n)]

    for d, t in docs:
        for s, _ in spans_of(_norm(t)):
            seen.setdefault(s, set()).add(d)
    dup = {s for s, ds in seen.items() if len(ds) >= 2}
    exp_stats, exp_clean = {}, {}
    for d, t in docs:
        w = _norm(t)
        starts = [p for s, p in spans_of(w) if s in dup]
        covered: set[int] = set()
        for p in starts:
            covered.update(range(p, min(p + k - 1, len(w)) + 1))
        kept = [w[i - 1] for i in range(1, len(w) + 1) if i not in covered]
        exp_stats[d] = (len(w), len(starts), len(covered))
        exp_clean[d] = (" ".join(kept), len(kept))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got_stats = {
        r["doc_id"]: (r["n_toks"], r["n_dup_spans"], r["dup_tokens"])
        for r in span_dedup_stats(df, k).collect()
    }
    got_clean = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in strip_duplicated_spans(df, k).collect()
    }
    assert got_stats == exp_stats
    assert got_clean == exp_clean
