"""Vendor cycler CSV/TSV source with dynamic preamble skip (SURVEY.md §2.1
S1/S2; reference battetl/extract/Extractor.py:30-59, 656-787).

The reference loops files, sniffs each header with Python line counting, and
``pd.read_csv``s one at a time, accumulating via concat. Spark-first design:

- the *sniff* stays on the driver but reads only the first ~4 KB of each file
  (O(#files), no data rows) — layout = (#preamble lines, separator, header);
- files are grouped by layout and each group becomes ONE distributed
  ``spark.read.text`` + ``from_csv`` plan — no per-file loop over data;
- preamble/header lines are removed distributedly by exact match against the
  sniffed lines (data rows are delimited numeric series; a collision with a
  2-field ``key: value`` preamble line is not possible for real cycler data);
- groups union by name (E1, reference Extractor.py:716-736 concat).

All columns parse as strings; casting/unit scaling is the transform layer's
job (battetl_spark.transform.normalize), keeping scan and transform one
Catalyst plan with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEPS = ["\t", ","]


def _split(line: str, sep: str) -> list[str]:
    return line.rstrip("\r\n").split(sep)


def sniff_layout(path: str, max_lines: int = 40) -> tuple[int, str, str, list[str]]:
    """Return (n_preamble_lines, sep, header_line, preamble_lines).

    Header = first line with ≥3 delimited fields that isn't a ``key: value``
    banner (heuristic analog of reference Extractor.py:740-787: preamble
    lines have ≤2 fields, ``key:`` forms, or Charge/Discharge banners).
    """
    with open(path, encoding="utf-8-sig", errors="replace") as f:
        head = [f.readline() for _ in range(max_lines)]
    for i, line in enumerate(head):
        if not line:
            break
        for sep in _SEPS:
            fields = _split(line, sep)
            if len(fields) >= 3 and not line.strip().lower().startswith(
                ("charge", "discharge")
            ):
                return i, sep, line.rstrip("\r\n"), [
                    h.rstrip("\r\n") for h in head[:i] if h
                ]
    raise ValueError(f"could not locate a header row in {path}")


def read_cycler_csv(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read cycler data files (mixed layouts allowed) into one string-typed
    DataFrame; vendor columns preserved verbatim for fingerprint detection."""
    groups: dict[tuple[int, str, str], list[str]] = {}
    preambles: dict[tuple[int, str, str], list[str]] = {}
    for p in sorted(paths):  # ascending name order (reference __init__.py:222-224)
        n, sep, header, pre = sniff_layout(p)
        key = (n, sep, header)
        groups.setdefault(key, []).append(p)
        preambles.setdefault(key, []).extend(pre)

    parts: list[DataFrame] = []
    for (n, sep, header), files in groups.items():
        cols = [c.strip().lstrip("﻿") for c in header.split(sep)]
        raw = spark.read.text(files)
        drop = set(preambles[(n, sep, header)]) | {header, ""}
        data = raw.filter(~F.col("value").isin(*drop)).filter(
            F.length(F.trim("value")) > 0
        )
        ddl = ", ".join(f"`{c}` STRING" for c in cols)
        parsed = data.select(
            F.from_csv(F.col("value"), ddl, {"sep": sep}).alias("r")
        ).select("r.*")
        parts.append(parsed)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
