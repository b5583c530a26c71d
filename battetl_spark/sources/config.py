"""Config + tiny-header sources (SURVEY.md §2.1 S3/S14/S15).

Driver-side by design: these read O(bytes) artifacts, not data."""

from __future__ import annotations

import json
import os


def load_config(path: str) -> dict:
    """JSON-then-YAML fallback (reference Utils.load_config utils.py:34-71)."""
    with open(path) as f:
        raw = f.read()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        import yaml

        return yaml.safe_load(raw)


def load_env(path: str = ".env") -> dict[str, str]:
    """Minimal .env loader into os.environ (reference utils.py:15-32);
    on a cluster these arrive via spark-submit --conf / env instead."""
    out: dict[str, str] = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip().strip('"').strip("'")
            os.environ.setdefault(k.strip(), out[k.strip()])
    return out


def read_report_header(path: str, max_lines: int = 30) -> dict[str, str] | None:
    """'TEST REPORT'-style metadata preamble → dict; None if the file is a
    data file (reference __read_global_info Extractor.py:764-830 — produces
    metadata only, no data rows)."""
    with open(path, encoding="utf-8-sig", errors="replace") as f:
        first = f.readline()
        if "TEST REPORT" not in first.upper():
            return None
        meta: dict[str, str] = {}
        for _ in range(max_lines):
            line = f.readline()
            if not line:
                break
            parts = [p.strip() for p in line.replace("\t", ",").split(",") if p.strip()]
            for i in range(0, len(parts) - 1, 2):
                key = parts[i].rstrip(":")
                meta[key] = parts[i + 1]
        return meta
