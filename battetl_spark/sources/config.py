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


def read_pickle(spark, path: str):
    """Pickled pandas frame → DataFrame (S5 analog, reference
    Extractor.py:832-854). Test/golden-file use only — driver-side by
    design (pickles are small fixtures, not data)."""
    import pandas as pd

    return spark.createDataFrame(pd.read_pickle(path))


def read_unstructured(spark, path: str, reader_kwargs: dict | None = None):
    """User-configured CSV/XLSX read (S4 analog, Extractor.py:127-187).
    CSV goes through the distributed reader; XLSX (no distributed codec in
    this container) reads via pandas on the driver — gated, small files
    only, mirroring the reference's semantics."""
    kw = reader_kwargs or {}
    if path.lower().endswith((".xlsx", ".xls")):
        import pandas as pd

        try:
            pdf = pd.read_excel(path, **kw)
        except ImportError as e:  # openpyxl absent in sandbox
            raise NotImplementedError(
                "xlsx reading requires openpyxl (not in this container); "
                "convert to CSV or install the codec"
            ) from e
        return spark.createDataFrame(pdf.astype(str))
    reader = spark.read.option("header", str(kw.get("header", True)).lower())
    if "sep" in kw:
        reader = reader.option("sep", kw["sep"])
    return reader.csv(path)


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
