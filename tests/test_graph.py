"""Connected-components / dedup-cluster operator tests.

Ground truth: a driver-side union-find over the collected edge list —
independent of the distributed large-star/small-star implementation.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from battetl_spark.analytics.graph import connected_components, dup_clusters

pytestmark = pytest.mark.textops


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min label per node
    return {n: find(n) for n in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df)
    return {r["node"]: r["component"] for r in got.collect()}


def test_chain_star_clique_disjoint(spark):
    edges = (
        [(i, i + 1) for i in range(1, 8)]  # chain 1..8 (worst diameter)
        + [(100, j) for j in range(101, 106)]  # star
        + [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]  # clique
        + [(300, 301)]  # pair
    )
    assert _cc(spark, edges) == _union_find(edges)


def test_self_loops_and_duplicates(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(90 + 40 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == _union_find(edges)


def test_labels_are_component_minimum(spark):
    # chain where ids descend: min propagation must cross every hop
    edges = [(i + 1, i) for i in range(1, 20)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}


def test_dup_clusters_covers_all_docs(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 3), (3, 7), (4, 8)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(docs, pairs).collect()
    }
    expect = {i: i for i in range(10)}
    expect.update({3: 1, 7: 1, 8: 4})
    assert got == expect
    # canonical keep-set = cluster representatives
    keep = sorted(d for d, c in got.items() if d == c)
    assert keep == [0, 1, 2, 4, 5, 6, 9]


def test_cluster_representatives(spark):
    from battetl_spark.analytics.graph import cluster_representatives

    docs = spark.createDataFrame(
        [(i, 100 + (i * 13) % 7) for i in range(10)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 7), (4, 8)], "id_a long, id_b long"
    )
    reps = {
        r["cluster_id"]: (r["rep_id"], r["n_members"])
        for r in cluster_representatives(docs, dup_clusters(docs, pairs)).collect()
    }
    # n_chars = 100 + (13i mod 7): cluster {1,3,7} → 106/104/100 → rep 1;
    # cluster {4,8} → 103 vs 106 → rep 8
    assert reps[1] == (1, 3) and reps[4] == (8, 2)
    assert all(n == 1 for c, (_, n) in reps.items() if c not in (1, 4))
    # tiebreak: equal priority keeps the SMALLER id
    d2 = spark.createDataFrame([(5, 7), (9, 7)], "doc_id long, n_chars long")
    p2 = spark.createDataFrame([(5, 9)], "id_a long, id_b long")
    got = cluster_representatives(d2, dup_clusters(d2, p2)).collect()
    assert got[0]["rep_id"] == 5 and got[0]["n_members"] == 2
