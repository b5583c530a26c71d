"""Deterministic sampling / data-mixture operators for training-data curation.

A web-scale corpus is never trained on verbatim: pipelines re-weight sources
("data mixing"), cap any one domain's share, and subsample to a token budget.
These operators make that reproducible at 100 TB:

- every sampling decision derives from ``md5(seed|id)`` — a pure column
  expression, so the SAME rows are selected on any cluster size, any
  partitioning, any retry (no RNG state, no ``rand()`` non-determinism
  across task re-execution), and an external system (the DuckDB oracles)
  can reproduce the exact keep-set;
- ``mixture_sample`` is MAP-ONLY (a filter over literal per-stratum rates —
  zero shuffle, survives any scale);
- ``calibrated_mixture_sample`` adds one tiny aggregate (#strata rows) to
  derive the rates that hit a target size mixture, then broadcast-joins
  them back — the corpus itself never shuffles;
- ``cap_per_stratum`` (domain-cap) ranks inside each stratum but first
  splits off under-cap strata with a broadcast count map, so only the
  over-cap minority ever enters the window Exchange.

Reference analog: the reference ETL has no sampling stage (it loads every
row — `/root/reference/battetl/load/Loader.py:144-234`); these belong to
this engine's LLM-pipeline layer (build brief), not a reference port.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 lowercase-hex digits = 52 bits: exactly representable in a double, and
# u = bits / 2^52 is a dyadic rational both engines compute bit-identically.
_U_DENOM = float(1 << 52)


def sample_uniform(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from an id column: the first 52 bits
    of ``md5('{seed}|{id}')`` scaled by 2^-52. Engine-agnostic — DuckDB
    reproduces it as
    ``cast('0x' || substring(md5(...), 1, 13) as bigint) / 2^52``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat_ws("|", F.lit(str(int(seed))), c.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") / F.lit(_U_DENOM)


def _rate_expr(stratum: Column, rates: Mapping[str, float],
               default_rate: float) -> Column:
    expr = F.lit(float(default_rate))
    for k, v in rates.items():
        expr = F.when(stratum == F.lit(k), F.lit(float(v))).otherwise(expr)
    return expr


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its deterministic uniform < its stratum's rate.

    Pure map-side filter (literal when-chain — no join, no shuffle); strata
    absent from ``rates`` sample at ``default_rate`` (0 = drop). Exactly
    reproducible anywhere: membership depends only on (seed, id, rates).
    """
    u = sample_uniform(id_col, seed)
    if not default_rate:
        # rate-0 strata can't match: an explicit isin pushes to the parquet
        # scan (In filter → row-group stats skipping), unlike the CASE chain
        df = df.filter(F.col(stratum_col).isin([k for k, v in rates.items() if v]))
    return df.filter(u < _rate_expr(F.col(stratum_col), rates, default_rate))


def calibrated_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    weights: Mapping[str, float],
    total_budget: float,
    *,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Sample toward a target SIZE mixture: stratum ``s`` gets an expected
    ``weights[s] * total_budget`` of ``size_col`` mass (rate capped at 1 —
    a stratum smaller than its allocation is kept whole, it is not
    oversampled).

    Two passes, neither shuffling the corpus: (1) one partial-aggregated
    ``groupBy(stratum).sum(size)`` producing #strata rows; (2) a broadcast
    join of the derived rates back onto the corpus and the same
    deterministic-hash filter as ``mixture_sample``. Strata without a
    weight are dropped. Rates derive from exact integer sums with one
    IEEE-double multiply/divide each, so an external engine reproduces the
    keep-set bit-for-bit.
    """
    stratum = F.col(stratum_col)
    totals = df.groupBy(stratum_col).agg(
        F.sum(F.col(size_col)).cast("double").alias("__total")
    )
    w = _rate_expr(stratum, weights, 0.0)
    rates = (
        totals.withColumn(
            "__rate",
            F.least(F.lit(1.0), w * F.lit(float(total_budget)) / F.col("__total")),
        )
        .where(w > 0)
        .select(stratum_col, "__rate")
    )
    u = sample_uniform(id_col, seed)
    return (
        # redundant with the rates join, but isin pushes to the parquet scan
        df.filter(stratum.isin([k for k, v in weights.items() if v]))
        .join(F.broadcast(rates), stratum_col)
        .filter(u < F.col("__rate"))
        .drop("__rate")
    )


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    n: int,
    order_by: Sequence[Column] | None = None,
    *,
    id_col: str = "doc_id",
    prefilter: bool = True,
) -> DataFrame:
    """Domain-cap: keep at most ``n`` rows per stratum, the top ``n`` under
    ``order_by`` (ties and default order broken by ``id_col`` — fully
    deterministic).

    Scale shape: ranking needs a per-stratum total order, which is a window
    Exchange on the stratum key — the one place a hot domain could skew.
    ``prefilter`` (default) first builds the per-stratum count map (partial
    aggregation → #strata rows) and broadcast-splits the corpus: under-cap
    strata pass through MAP-SIDE, only over-cap rows enter the window. On a
    web corpus (most domains under the cap, a few giants over) the window
    input shrinks to the giants, and their rank is one partition each —
    the honest cost of an exact global top-n per key.
    """
    from pyspark.sql import Window

    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    win = Window.partitionBy(stratum_col).orderBy(*order)
    ranked = lambda d: (  # noqa: E731
        d.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= int(n))
        .drop("__rk")
    )
    if not prefilter:
        return ranked(df)
    counts = df.groupBy(stratum_col).count()
    over = counts.filter(F.col("count") > int(n)).select(stratum_col)
    tagged = df.join(
        F.broadcast(over.withColumn("__over", F.lit(True))), stratum_col, "left"
    )
    under = tagged.filter(F.col("__over").isNull()).drop("__over")
    return under.unionByName(ranked(tagged.filter("__over").drop("__over")))


def assign_split(
    df: DataFrame,
    fractions: Mapping[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets exactly one
    split name, decided by where its ``sample_uniform`` falls among the
    cumulative fraction thresholds (``fractions`` insertion order; the last
    split absorbs the rounding remainder so the partition is total).

    Pure map-side column (no shuffle, no RNG state): membership depends
    only on (seed, id, fractions), so the SAME document lands in the same
    split on any cluster size, any retry, any engine — the property that
    keeps eval sets leak-free across pipeline re-runs. Reference analog:
    none (the reference has no dataset-split stage); LLM-pipeline layer.
    """
    names = list(fractions)
    if not names:
        raise ValueError("fractions must name at least one split")
    u = sample_uniform(id_col, seed)
    # forward WHEN chain: first matching threshold wins, mirroring the
    # oracle's CASE evaluation order exactly
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        clause = (u < F.lit(cum), F.lit(name))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)
