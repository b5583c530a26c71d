"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set,
  dot products via zip_with/aggregate (JVM-side), per-query top-k via window.
  At 100 TB this is the correctness baseline and the re-rank stage.
- ``lsh_cosine_topk``: scale path — random-hyperplane LSH buckets (signature
  from deterministic hash-based pseudo-planes), candidates = same bucket (or
  neighboring multi-probe buckets), exact re-rank inside buckets only. The
  shuffle moves (bucket, id, vector) once; no cross product ever forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. ``queries`` must be broadcast-small
    (the usual ANN regime: few queries, huge corpus)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("__v")
    )
    sim = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine(
                    F.col("__v").cast("array<double>"),
                    F.col("__qv").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def _hyperplane_sign(vec_col, plane_id: int, dim: int):
    """Deterministic pseudo-random hyperplane: component j of plane p derives
    from xxhash64(p, j) mapped to {-1, +1}; sign of <v, plane>."""
    dot = F.aggregate(
        F.zip_with(
            vec_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.when(
                    F.pmod(F.xxhash64(F.lit(plane_id), j), 2) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            lambda x, p: x * p,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (dot >= 0).cast("int")


def lsh_bucket(vec_col, dim: int, num_planes: int = 12):
    """Random-hyperplane signature → integer bucket (2^num_planes buckets)."""
    bucket = F.lit(0)
    for p in range(num_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec_col, p, dim)
    return bucket


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, exact
    cosine re-rank inside the bucket. Recall grows with fewer planes /
    multi-probe; bucket join replaces the cross join at scale."""
    v = vectors.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("bucket", lsh_bucket(F.col("__v"), dim, num_planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("bucket", lsh_bucket(F.col("__qv"), dim, num_planes))
    sim = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__v"), F.col("__qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
