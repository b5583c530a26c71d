"""Interleaved one-JVM A/B of runtime-settable SQL confs over declared
queries (round-6 session-2 harness; bench.py is FROZEN so this lives apart).

The VM's hypervisor steal swings isolated runs ±45-60% (CLAUDE.md), so A and
B alternate rep-by-rep in ONE JVM: each pair of adjacent samples shares the
same window, and the per-rep deltas are comparable even when the absolute
numbers drift.

Usage:
  python tools/bench_ab.py 'conf1=val1,conf2=val2' q1 q2 ...
  REPS=3 SPARK_GRAFT_SF_DIR=/tmp/sf1 python tools/bench_ab.py ...

A = session defaults; B = the given conf overrides (restored after each B
rep). Prints per-rep samples and the median A/B per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    conf_spec = sys.argv[1]
    names = sys.argv[2:]
    overrides = dict(kv.split("=", 1) for kv in conf_spec.split(","))
    reps = int(os.environ.get("REPS", "3"))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from battetl_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="battetl_spark-bench-ab",
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "8m",
                          "spark.sql.files.openCostInBytes": "256k",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    spark.range(1_000_000).count()

    baseline = {k: spark.conf.get(k, None) for k in overrides}

    def set_conf(active: bool):
        for k, v in (overrides if active else baseline).items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    results = {}
    for name in names:
        a_samples, b_samples = [], []
        # warm both variants once (JIT) before timing
        for active in (False, True):
            set_conf(active)
            qs[name](spark, sf_dir).count()
            spark.catalog.clearCache()
        for _ in range(reps):
            for active, sink in ((False, a_samples), (True, b_samples)):
                set_conf(active)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{'B' if active else 'A'}")
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                sink.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        set_conf(False)
        results[name] = {
            "A": a_samples, "B": b_samples,
            "A_med": round(statistics.median(a_samples), 3),
            "B_med": round(statistics.median(b_samples), 3),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print("== SUMMARY ==")
    for name, r in results.items():
        d = r["B_med"] - r["A_med"]
        print(f"{name}: A={r['A_med']} B={r['B_med']} delta={d:+.3f}")


if __name__ == "__main__":
    main()
