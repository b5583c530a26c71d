"""Driver-side config/header sources (S3/S14/S15 analogs) — no Spark needed."""

from __future__ import annotations

from battetl_spark.sources.config import load_config, load_env, read_report_header


def test_load_config_json_then_yaml(tmp_path):
    j = tmp_path / "c.json"
    j.write_text('{"a": 1}')
    assert load_config(str(j)) == {"a": 1}
    y = tmp_path / "c.yaml"
    y.write_text("a: 1\nb:\n  c: 2\n")
    assert load_config(str(y)) == {"a": 1, "b": {"c": 2}}


def test_load_env(tmp_path, monkeypatch):
    e = tmp_path / ".env"
    e.write_text("# comment\nDB_USER=alice\nDB_PASS='s3cret'\n")
    monkeypatch.delenv("DB_USER", raising=False)
    out = load_env(str(e))
    assert out == {"DB_USER": "alice", "DB_PASS": "s3cret"}
    assert load_env(str(tmp_path / "missing")) == {}


def test_read_report_header(tmp_path):
    f = tmp_path / "info.csv"
    f.write_text(
        "TEST REPORT\n"
        "Test Name:,TST-1,Channel:,7\n"
        "Schedule:,sched.sdx\n"
    )
    meta = read_report_header(str(f))
    assert meta["Test Name"] == "TST-1"
    assert meta["Channel"] == "7"
    assert meta["Schedule"] == "sched.sdx"
    data = tmp_path / "data.csv"
    data.write_text("a,b,c\n1,2,3\n")
    assert read_report_header(str(data)) is None
