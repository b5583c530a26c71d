"""Deterministic sampling / mixture / domain-cap operator tests.

Ground truths are INDEPENDENT of the Spark implementation: membership is
recomputed driver-side with hashlib.md5, caps with a pandas sort/head.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from battetl_spark.analytics.sampling import (
    calibrated_mixture_sample,
    cap_per_stratum,
    mixture_sample,
)

pytestmark = pytest.mark.textops


def _u(doc_id: int, seed: int = 0) -> float:
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def _docs(spark, n=400, strata=("a", "b", "c", "d")):
    rows = [(i, strata[i % len(strata)], 50 + (i * 37) % 200) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_mixture_sample_matches_hash_ground_truth(spark):
    rates = {"a": 0.5, "b": 0.1, "c": 1.0}
    got = sorted(
        r["doc_id"]
        for r in mixture_sample(_docs(spark), "lang", rates, seed=7).collect()
    )
    strata = ("a", "b", "c", "d")
    expect = sorted(
        i for i in range(400)
        if _u(i, 7) < rates.get(strata[i % 4], 0.0)
    )
    assert got == expect and len(got) > 0
    # d-stratum dropped entirely (default_rate=0), c kept whole
    assert all(i % 4 != 3 for i in got)
    assert sum(1 for i in got if i % 4 == 2) == 100


def test_mixture_sample_is_seed_sensitive_and_stable(spark):
    d = _docs(spark)
    a1 = {r["doc_id"] for r in mixture_sample(d, "lang", {"a": 0.5}).collect()}
    a2 = {r["doc_id"] for r in mixture_sample(d, "lang", {"a": 0.5}).collect()}
    b = {r["doc_id"] for r in
         mixture_sample(d, "lang", {"a": 0.5}, seed=1).collect()}
    assert a1 == a2 and a1 != b


def test_mixture_sample_plan_is_map_only(spark):
    plan = mixture_sample(
        _docs(spark), "lang", {"a": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_calibrated_mixture_hits_size_targets(spark):
    d = _docs(spark, n=2000)
    weights = {"a": 0.5, "b": 0.25, "c": 0.25}
    budget = 60_000.0
    out = calibrated_mixture_sample(
        d, "lang", weights, budget, size_col="n_chars"
    ).toPandas()
    assert set(out["lang"]) <= set(weights)
    got = out.groupby("lang")["n_chars"].sum()
    for k, w in weights.items():
        # deterministic hash sampling ≈ binomial: allow 4σ-ish slack
        assert abs(got[k] - w * budget) < 0.35 * w * budget, (k, got[k])
    # rate-1 case: allocation above a stratum's total keeps it whole
    whole = calibrated_mixture_sample(
        d, "lang", {"a": 1.0}, 10**9, size_col="n_chars"
    )
    assert whole.count() == d.filter("lang = 'a'").count()


def test_cap_per_stratum_matches_pandas(spark):
    d = _docs(spark, n=203)  # uneven strata
    pdf = d.toPandas()
    expect = (
        pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("lang").head(30)
    )
    for pf in (True, False):
        got = cap_per_stratum(
            d, "lang", 30, [F.col("n_chars").desc()], prefilter=pf
        ).toPandas()
        assert sorted(got["doc_id"]) == sorted(expect["doc_id"]), pf


def test_cap_per_stratum_under_cap_passthrough(spark):
    d = _docs(spark, n=40)  # 10 per stratum, cap 25: nothing ranked away
    got = cap_per_stratum(d, "lang", 25, [F.col("n_chars").desc()])
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(40))


def test_cap_prefilter_windows_only_over_cap_rows(spark):
    # one giant stratum + many small ones: the window input must be the
    # giant alone (the broadcast count-map split), not the whole frame
    rows = [(i, "giant" if i < 300 else f"s{i}", i) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = cap_per_stratum(d, "lang", 50, [F.col("n_chars").desc()])
    got = out.toPandas()
    assert len(got[got["lang"] == "giant"]) == 50
    assert got["lang"].nunique() == 101
    # giant keeps its top-50 by n_chars
    assert sorted(got[got["lang"] == "giant"]["doc_id"]) == list(range(250, 300))


def test_assign_split_total_deterministic_partition(spark):
    """Every row gets exactly one split; membership is a pure function of
    (seed, id) — re-evaluation and re-partitioning cannot move a doc —
    and the realized sizes track the requested fractions."""
    from battetl_spark.analytics.sampling import assign_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(df, fr, seed=7)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(a) == 2000 and set(a.values()) <= set(fr)
    b = {r["doc_id"]: r["split"]
         for r in assign_split(df.repartition(13), fr, seed=7).collect()}
    assert a == b
    import collections
    c = collections.Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    # different seed reshuffles membership
    c2 = {r["doc_id"]: r["split"]
          for r in assign_split(df, fr, seed=8).collect()}
    assert c2 != a


def test_assign_split_is_map_only(spark):
    from battetl_spark.analytics.sampling import assign_split

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = assign_split(df, {"a": 0.5, "b": 0.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
