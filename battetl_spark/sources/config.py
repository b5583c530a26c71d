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


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _xlsx_cell_col(ref: str) -> int:
    """'BC12' → 0-based column index 54."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def read_xlsx_grid(path: str, sheet: int = 1) -> list[list[str]]:
    """Minimal stdlib XLSX reader (zip of SpreadsheetML): shared strings,
    inline strings, and raw values of one worksheet as a ragged string grid.
    No codec dependency — xlsx files are small config/lab exports here
    (S4 analog, reference Extractor.py:168-186 pd.read_excel path)."""
    import zipfile
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        root = ET.fromstring(z.read(f"xl/worksheets/sheet{sheet}.xml"))
        rows: list[list[str]] = []
        for row in root.iter(f"{_XLSX_NS}row"):
            cells: dict[int, str] = {}
            for c in row.iter(f"{_XLSX_NS}c"):
                idx = _xlsx_cell_col(c.attrib.get("r", "A"))
                t = c.attrib.get("t", "n")
                if t == "inlineStr":
                    v = "".join(x.text or "" for x in c.iter(f"{_XLSX_NS}t"))
                else:
                    vel = c.find(f"{_XLSX_NS}v")
                    v = vel.text if vel is not None and vel.text else ""
                    if t == "s" and v:
                        v = shared[int(v)]
                cells[idx] = v
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i, "") for i in range(width)])
        return rows


def read_unstructured(spark, path: str, reader_kwargs: dict | None = None):
    """User-configured CSV/XLSX read (S4 analog, Extractor.py:127-187).
    CSV goes through the distributed reader; XLSX parses via the stdlib
    SpreadsheetML reader on the driver (gated, small files only — the
    reference's pd.read_excel is likewise an eager single-node read)."""
    kw = reader_kwargs or {}
    if path.lower().endswith((".xlsx", ".xlsm", ".xls")):
        if path.lower().endswith(".xls"):
            # legacy binary OLE/BIFF8 — round-5 stdlib reader (sources/xls.py)
            from battetl_spark.sources.xls import read_xls_grid as _grid
        else:
            _grid = read_xlsx_grid
        header = int(kw.get("header", 0))
        skiprows = int(kw.get("skiprows", 0))
        grid = _grid(path, sheet=int(kw.get("sheet", 1)))[skiprows:]
        if header >= len(grid):
            raise ValueError(
                f"sheet has {len(grid)} rows after skiprows={skiprows}; "
                f"header row {header} does not exist"
            )
        cols = [c or f"col_{i}" for i, c in enumerate(grid[header])]
        width = len(cols)
        data = [
            tuple((r + [""] * width)[:width]) for r in grid[header + 1:]
        ]
        return spark.createDataFrame(data, cols)
    reader = spark.read.option("header", str(kw.get("header", True)).lower())
    if "sep" in kw:
        reader = reader.option("sep", kw["sep"])
    return reader.csv(path)


def attach_datasheet(meta: dict, key: str = "datasheet") -> dict:
    """Dim-row binary attachment: if ``meta[key]`` is an existing file path,
    replace it with the file's bytes (reference Loader.py:908-917 loads the
    cell datasheet PDF into a binary dim column); missing files raise so the
    dim insert fails loudly instead of storing a dangling path."""
    out = dict(meta)
    if key in out:
        path = out[key]
        if not isinstance(path, (str, os.PathLike)) or not os.path.exists(path):
            raise FileNotFoundError(f"datasheet file not found: {path!r}")
        with open(path, "rb") as f:
            out[key] = f.read()
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
