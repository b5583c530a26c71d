"""TF-IDF top-terms — ground truth, determinism, and plan shape."""

from __future__ import annotations

import math
import re

import pytest

from battetl_spark.analytics.terms import term_frequencies, tfidf_top_terms

pytestmark = pytest.mark.textops

DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry date"),
    (3, "apple apple apple unique"),
    (4, ""),
    (5, "the the the the"),
]


def _norm(t):
    t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
    return re.sub(r"\s+", " ", t).strip().split(" ")


def _truth(top_n, log=False):
    tf = {}
    for d, t in DOCS:
        for w in _norm(t):
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dfq = {}
    for (d, w), _ in tf.items():
        dfq[w] = dfq.get(w, 0) + 1
    n = len(DOCS)
    out = {}
    for (d, w), c in tf.items():
        ratio = c * (n + 1.0) / (dfq[w] + 1.0)
        s = c * (math.log((n + 1.0) / (dfq[w] + 1.0)) + 1.0) if log else ratio
        out.setdefault(d, []).append((-s, w, c))
    res = {}
    for d, rows in out.items():
        rows.sort()
        res[d] = [
            (w, c, i + 1, round(-negs, 6))
            for i, (negs, w, c) in enumerate(rows[:top_n])
        ]
    return res


def test_tfidf_matches_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {}
    for r in tfidf_top_terms(df, 3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["rk"], r["score"])
        )
    for d in got:
        got[d].sort(key=lambda x: x[2])
    assert got == _truth(3)
    # empty doc normalizes to the '' token and still ranks
    assert got[4][0][0] == ""


def test_tfidf_log_mode_matches_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {}
    for r in tfidf_top_terms(df, 3, idf="log").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["rk"], r["score"])
        )
    for d in got:
        got[d].sort(key=lambda x: x[2])
    exp = _truth(3, log=True)
    for d in exp:
        assert [g[:3] for g in got[d]] == [e[:3] for e in exp[d]]
        for g, e in zip(got[d], exp[d]):
            assert abs(g[3] - e[3]) < 1e-9


def test_term_frequencies_partial_agg_and_broadcast(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = term_frequencies(df)._jdf.queryExecution().executedPlan().toString()
    # map-side combine before the shuffle (partial HashAggregate)
    assert plan.count("HashAggregate") >= 2
    full = tfidf_top_terms(df, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in full  # corpus-size one-row join
    assert "CartesianProduct" not in full
