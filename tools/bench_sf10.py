"""sf10 commit-path probe (round-4 verdict #7): one decade beyond the sf1
evidence — 200M change events replayed through the CoW and MOR merge paths
on local[32], verifying that manifest/fence metadata and ingest throughput
hold at another 10×.

Only the REPLAY is probed (the verdict's ask): ``bench.run_cdc_merge``
generates its deterministic skewed change stream distributively, so no
sf10 parquet directory is needed. Results are hand-merged into
BENCH/BASELINE.md and CLAUDE.md.

Usage: SPARK_DRIVER_MEM=48g python tools/bench_sf10.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from battetl_spark.session import get_spark
    from bench import run_cdc_merge

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,  # 200M-event batches: keep partitions
        app_name="battetl_spark-sf10",  # small enough to sort in memory
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "64m",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).count()
    run_cdc_merge(spark, 100_000, n_batches=2)  # pay merge-path JIT untimed

    out = {"n_events": n_events, "cpus": cpus}
    for mode in ("cow", "mor"):
        r = run_cdc_merge(spark, n_events, n_batches=4, mode=mode)
        out[mode] = {
            "seconds": round(r["seconds"], 1),
            "events_per_sec": int(n_events / r["seconds"]),
            **{k: r[k] for k in r if k not in ("seconds",)},
        }
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
