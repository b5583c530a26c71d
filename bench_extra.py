"""Round-6 optimization measurement harness (guide §1) — bench.py is FROZEN
for driver measurement, so all extra instrumentation lives here.

Usage:
  python bench_extra.py q1 q2 ...        # time queries (bench-identical method)
  python bench_extra.py --plans q1 ...   # also write plans/r06/<q>_<tag>.txt
  python bench_extra.py --noop q1 ...    # noop-sink isolation (guide §1.4)
  PLAN_TAG=before|after                  # suffix for plan files

Reports the same warm/cold split as bench.py (count() action, clearCache
between reps; RE_INGEST queries report best-of-two).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RE_INGEST = {
    "cdc_history", "cdc_asof_state", "doc_minhash_incremental",
    "doc_span_incremental", "corpus_clean_incremental",
    "emb_near_dup_incremental",
}


def main():
    args = [a for a in sys.argv[1:]]
    write_plans = "--plans" in args
    noop = "--noop" in args
    reps = 2
    for flag in ("--plans", "--noop"):
        if flag in args:
            args.remove(flag)
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.environ.get("PLAN_TAG", "before")

    from battetl_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="battetl_spark-bench-extra",
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "8m",
                          "spark.sql.files.openCostInBytes": "256k",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    spark.range(1_000_000).count()  # JVM warm-up, same as bench.py

    timings, cold = {}, {}
    for name in names:
        if write_plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        cold[name] = samples[0]
        timings[name] = (
            min(samples) if name in RE_INGEST else samples[-1]
        )
        print(json.dumps({"q": name, "warm": timings[name],
                          "samples": samples}), flush=True)
    print(json.dumps({"sf": sf_dir, "queries": timings,
                      "queries_cold": cold}), flush=True)


if __name__ == "__main__":
    main()
