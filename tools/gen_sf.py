"""Deterministic K× scale-up of a testdata sf directory (round-3 verdict
task #7: bench at sf1 to expose metadata/commit overheads sf0.1 hides).

Usage: python tools/gen_sf.py SRC_DIR OUT_DIR K

Each output table is K stacked copies of the source with copy-shifted keys
— entirely distributed (one Spark job per table, no driver loops), fully
deterministic (hash-derived mutations, no RNG state):

- dims (region, nation): copied once, unshifted.
- fact/dim keys shift by copy × (max_key + 1), consistently across tables
  (orders.o_custkey shifts with customer.c_custkey etc.), so joins keep
  exactly the source's fan-out while group/key cardinality grows K×.
- documents: copy 0 verbatim; copies > 0 substitute ~50% of words (hash
  -selected per copy) so no cross-copy pair is an exact, minhash, simhash
  or ngram near-dup — NOR a banded-LSH candidate (at 25% mutation the
  cross-copy Jaccard lands ≈0.27, where r=2 banding makes ~70% of the
  K²·N same-doc pairs candidates: +20s of exact-verify work at sf1 that
  measures the generator, not the engine; at 50% the candidate rate is
  <8%). The dedup benches measure scale, not a planted-duplicate
  explosion.
- embeddings: copy 0 verbatim; copies > 0 get fully hash-generated vectors
  (near-orthogonal to everything) for the same reason.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _shift(df: DataFrame, col: str, c: int, step: int):
    return df.withColumn(col, F.col(col) + F.lit(c * step))


def scale_dir(spark, src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    t = {n: spark.read.parquet(f"{src}/{n}.parquet")
         for n in ("region nation customer supplier part orders lineitem "
                   "events documents embeddings").split()}
    step = {
        "ck": t["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "sk": t["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "pk": t["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "ok": t["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "eid": t["events"].agg(F.max("event_id")).first()[0] + 1,
        "uid": t["events"].agg(F.max("user_id")).first()[0] + 1,
        "did": t["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vid": t["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
    }

    def copies(name, fn):
        df = fn(t[name], 0)
        for c in range(1, k):
            df = df.unionByName(fn(t[name], c))
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {k}x written", flush=True)

    for name in ("region", "nation"):
        t[name].write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    copies("customer", lambda df, c: _shift(df, "c_custkey", c, step["ck"]))
    copies("supplier", lambda df, c: _shift(df, "s_suppkey", c, step["sk"]))
    copies("part", lambda df, c: _shift(df, "p_partkey", c, step["pk"]))
    copies("orders", lambda df, c: _shift(
        _shift(df, "o_orderkey", c, step["ok"]), "o_custkey", c, step["ck"]))
    copies("lineitem", lambda df, c: _shift(_shift(_shift(
        df, "l_orderkey", c, step["ok"]), "l_partkey", c, step["pk"]),
        "l_suppkey", c, step["sk"]))
    copies("events", lambda df, c: _shift(
        _shift(df, "event_id", c, step["eid"]), "user_id", c, step["uid"]))

    def doc_copy(df, c):
        df = _shift(df, "doc_id", c, step["did"])
        if c == 0:
            return df
        words = F.split(F.trim(F.col("text")), r"\s+")
        mutated = F.concat_ws(
            " ",
            F.transform(
                words,
                lambda w: F.when(
                    F.pmod(F.xxhash64(w, F.lit(c)), F.lit(2)) == 0,
                    F.concat(w, F.lit(f"_{c}")),
                ).otherwise(w),
            ),
        )
        return df.withColumn("text", mutated).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    copies("documents", doc_copy)

    dim = len(t["embeddings"].first()["embedding"])

    def emb_copy(df, c):
        df = _shift(df, "vec_id", c, step["vid"])
        if c == 0:
            return df
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(c), i), F.lit(2001))
                 - F.lit(1000)) / F.lit(1000.0)
            ).cast("float"),
        )
        return df.withColumn("embedding", vec).withColumn(
            "label", F.pmod(F.xxhash64(F.col("vec_id"), F.lit(c)), F.lit(8))
            .cast("int")
        )

    copies("embeddings", emb_copy)


if __name__ == "__main__":
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from battetl_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      app_name="gen_sf")
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir(spark, src, out, k)
