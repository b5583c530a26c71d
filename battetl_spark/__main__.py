"""CLI entry point (reference analog: ``battetl -c|-e|-t|-l|-etl config``,
battetl/__init__.py:11-76; SURVEY.md §3.3). Also installed as the
``battetl-spark`` console script (pyproject.toml; reference setup.py:31-35).

  python -m battetl_spark -c DATA_DIR CONFIG_OUT   scan dir -> emit config
  python -m battetl_spark -e|-t|-etl CONFIG        run stages
  python -m battetl_spark -l CONFIG                load-only: re-load a saved
                                                   transformed artifact
                                                   (config key
                                                   transformed_artifact_path,
                                                   default
                                                   <table_path>_transformed;
                                                   written by -t)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


# filename-pattern rules (reference __init__.py:197-220 semantics)
DATA_PATTERNS = [r"\d+\.txt$", r".*Wb.*\.csv$"]
STATS_PATTERNS = [r".*\[STATS\]\.txt$", r".*StatisticByCycle\.csv$"]
SCHEDULE_PATTERNS = [r".*\.000$", r".*\.sdx$", r".*\.xml$"]


def create_config(data_dir: str) -> dict:
    files = sorted(os.listdir(data_dir))

    def matches(pats, f):
        return any(re.search(p, f, re.IGNORECASE) for p in pats)

    stats = [f for f in files if matches(STATS_PATTERNS, f)]
    sched = [f for f in files if matches(SCHEDULE_PATTERNS, f)]
    data = [
        f for f in files
        if matches(DATA_PATTERNS, f) and f not in stats and f not in sched
    ]
    j = lambda fs: [os.path.join(data_dir, f) for f in fs]  # noqa: E731
    return {
        "data_file_path": j(data),
        "stats_file_path": j(stats),
        "schedule_file_path": j(sched),
        "table_path": os.path.join(data_dir, "lake_table"),
    }


def main(argv=None):
    p = argparse.ArgumentParser(prog="battetl_spark")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("-c", action="store_true", help="create config from data dir")
    g.add_argument("-e", action="store_true", help="extract only")
    g.add_argument("-t", action="store_true", help="extract + transform")
    g.add_argument("-l", action="store_true",
                   help="load-only: re-load the saved transformed artifact")
    g.add_argument("-etl", action="store_true", help="full pipeline")
    p.add_argument("args", nargs="+")
    ns = p.parse_args(argv)

    if ns.c:
        data_dir = ns.args[0]
        out = ns.args[1] if len(ns.args) > 1 else "battetl_spark_config.json"
        cfg = create_config(data_dir)
        with open(out, "w") as f:
            json.dump(cfg, f, indent=2)
        print(f"wrote {out}")
        return 0

    from battetl_spark.etl import BattEtl
    from battetl_spark.session import get_spark
    from battetl_spark.sources.config import load_config

    cfg = load_config(ns.args[0])
    etl = BattEtl(get_spark(), cfg)
    if ns.l:  # load-only: no extract/transform, read the saved artifact
        etl.load_from_artifact()
        print("loaded (from transformed artifact)")
        return 0
    etl.extract()
    if ns.e:
        print(f"extracted columns: {etl.raw.columns}")
        return 0
    etl.transform()
    if ns.t:
        msg = f"transformed rows: {etl.test_data.count()}"
        if cfg.get("transformed_artifact_path") or cfg.get("table_path"):
            msg += f" (artifact: {etl.save_transformed()})"
        print(msg)
        return 0
    etl.load()
    print("loaded")
    return 0


if __name__ == "__main__":
    sys.exit(main())
