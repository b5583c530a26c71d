"""Quick mode + CLI entry points (reference analogs §3.2/§3.3)."""

from __future__ import annotations

import pytest

import json

from battetl_spark.__main__ import create_config, main as cli_main
from battetl_spark.quick import battetl_quick, classify_file
from battetl_spark.sources.config import read_pickle
from tests.test_transform import VENDOR_A, VENDOR_M

pytestmark = pytest.mark.etl


def test_create_config_pattern_scan(tmp_path):
    (tmp_path / "BG_079 [STATS].txt").write_text("x")
    (tmp_path / "BG_079_001.txt").write_text("x")
    (tmp_path / "proc.000").write_text("x")
    (tmp_path / "Cell_Wb_1.csv").write_text("x")
    cfg = create_config(str(tmp_path))
    names = lambda k: [p.split("/")[-1] for p in cfg[k]]  # noqa: E731
    assert names("stats_file_path") == ["BG_079 [STATS].txt"]
    assert names("schedule_file_path") == ["proc.000"]
    assert set(names("data_file_path")) == {"BG_079_001.txt", "Cell_Wb_1.csv"}


def test_cli_config_roundtrip(tmp_path, capsys):
    (tmp_path / "data_001.txt").write_text("x")
    out = tmp_path / "cfg.json"
    assert cli_main(["-c", str(tmp_path), str(out)]) == 0
    cfg = json.loads(out.read_text())
    assert "table_path" in cfg


def test_quick_mode(spark, tmp_path):
    f = tmp_path / "a.csv"
    f.write_text(VENDOR_A)
    t = battetl_quick(spark, str(f), str(tmp_path / "qt"))
    assert t.scan().count() == 1
    assert t.snapshot()["properties"]["quick_mode"] is True
    # second quick load appends to the same table
    t2 = battetl_quick(spark, str(f), str(tmp_path / "qt"))
    assert t2.scan().count() == 2


def test_classify_file(spark, tmp_path):
    m = tmp_path / "m.txt"
    m.write_text(VENDOR_M)
    from battetl_spark.sources import read_cycler_csv

    assert classify_file(read_cycler_csv(spark, [str(m)])) == "data"


def test_read_pickle(spark, tmp_path):
    import pandas as pd

    p = tmp_path / "g.pkl"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_pickle(p)
    df = read_pickle(spark, str(p))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_cli_load_only_stage(spark, tmp_path, capsys):
    """`-t` persists the transformed artifact; `-l` re-loads it into the
    table WITHOUT re-running extract/transform (reference
    battetl/__init__.py:53,71-72 load-only stage)."""
    import os

    from battetl_spark.lake import LakeTable

    data = tmp_path / "a.csv"
    data.write_text(VENDOR_A)
    cfg = {
        "data_file_path": [str(data)],
        "table_path": str(tmp_path / "lake_table"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    assert cli_main(["-t", str(cfg_path)]) == 0
    artifact = cfg["table_path"] + "_transformed"
    assert os.path.isdir(artifact)
    assert "artifact" in capsys.readouterr().out

    assert cli_main(["-l", str(cfg_path)]) == 0
    t = LakeTable.load(spark, cfg["table_path"])
    n = t.scan().count()
    assert n >= 1
    # a second load-only run appends again from the same artifact — no
    # extract/transform required (the artifact is the only input)
    os.remove(str(data))
    assert cli_main(["-l", str(cfg_path)]) == 0
    assert t.scan().count() == 2 * n


def test_console_script_declared():
    """pyproject declares the battetl-spark console entry point mapping to
    the same main() `python -m battetl_spark` runs (reference
    setup.py:31-35)."""
    import os
    import tomllib

    with open(os.path.join(os.path.dirname(__file__), "..", "pyproject.toml"),
              "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["scripts"]["battetl-spark"] == (
        "battetl_spark.__main__:main"
    )
    mod, func = meta["project"]["scripts"]["battetl-spark"].split(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), func))
