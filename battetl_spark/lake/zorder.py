"""Z-order (Morton) sort keys for multi-dimension clustered compaction.

Single-column range clustering (``compact(cluster_by="ts")``) gives a 100-TB
table file skipping on ONE dimension; a scan filtered on any other column
still opens every file of every qualifying bucket. Z-ordering interleaves
the bits of several columns' quantized ranks so that files holding
contiguous Z ranges are simultaneously tight in EVERY participating
dimension — the Delta ``OPTIMIZE ZORDER BY`` / Iceberg ``sort_order
(zorder)`` idea, built here from plain Catalyst bit expressions.

The read path needs NO new machinery: zone maps already store per-file
min/max for each stats column, and a Z-sorted file's min/max is tight in
each dimension, so the existing ``scan(filters=...)`` skipping works on
any Z-ordered column. The curve only decides the WRITE order.

Quantization is linear min-max over the rows being rewritten (one tiny
aggregate — no sampling pass, same rule as the engine's other write paths:
never execute the child twice). Nullable columns rank NULL as 0 so rows
stay stable; ``max == min`` degrades that dimension to a constant
(harmless). Non-numeric, non-timestamp columns are refused — Z-ordering
needs a total order with meaningful distance, which strings don't give
without collation assumptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZORDERABLE = (
    "int", "bigint", "smallint", "tinyint", "float", "double", "decimal",
    "date", "timestamp", "timestamp_ntz",
)


def check_zorderable(df_schema, cols: list[str]) -> None:
    by_name = {f.name: f.dataType.simpleString() for f in df_schema.fields}
    for c in cols:
        t = by_name.get(c)
        if t is None:
            raise ValueError(f"cluster_by column {c!r} not in schema")
        if not any(t.startswith(z) for z in _ZORDERABLE):
            raise ValueError(
                f"cluster_by column {c!r} has type {t} — Z-order needs a "
                "numeric / date / timestamp column"
            )


def _dbl(col: str, dtype: str) -> Column:
    """Rank-preserving double view of a Z-orderable column. timestamp_ntz
    is decomposed into date/time parts arithmetically — the former
    ``cast("timestamp")`` route went through the SESSION timezone, which
    is non-monotone at DST fall-back transitions (clustering quality only,
    but silently so). Seconds-scale doubles stay exact to the microsecond
    until far beyond 2100 (< 2^53 quanta). Instant timestamps use
    unix_micros directly (tz-independent); dates their day number."""
    c = F.col(col)
    if dtype == "timestamp_ntz":
        sec = F.expr(f"extract(SECOND FROM `{col}`)").cast("double")
        return (
            F.unix_date(c.cast("date")).cast("double") * 86400.0
            + F.hour(c).cast("double") * 3600.0
            + F.minute(c).cast("double") * 60.0
            + sec
        )
    if dtype.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if dtype == "date":
        return F.unix_date(c).cast("double")
    return c.cast("double")


def _types(df_schema, cols: list[str]) -> list[str]:
    by_name = {f.name: f.dataType.simpleString() for f in df_schema.fields}
    return [by_name[c] for c in cols]


def column_ranges(df: DataFrame, cols: list[str]) -> tuple[list, list]:
    """One partial-aggregated pass → per-column (min, max) as doubles.
    The only data the driver sees is 2×len(cols) scalars."""
    types = _types(df.schema, cols)
    aggs = []
    for c, t in zip(cols, types):
        d = _dbl(c, t)
        aggs += [F.min(d).alias(f"__mn_{c}"), F.max(d).alias(f"__mx_{c}")]
    row = df.agg(*aggs).first()
    mins = [row[f"__mn_{c}"] for c in cols]
    maxs = [row[f"__mx_{c}"] for c in cols]
    return mins, maxs


def zorder_key(
    cols: list[str], mins: list, maxs: list, bits: int | None = None,
    types: list[str] | None = None,
) -> Column:
    """Morton key over ``cols``: each column linearly quantized to ``bits``
    bits against [min, max], bit-interleaved most-significant-first (column
    order breaks intra-cell ties). ``bits`` defaults to the largest fitting
    63/len(cols). Pure Catalyst (shift/and/or) — evaluated once per row at
    compaction write time, never at read time."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits is None:
        bits = min(16, 63 // n)
    if bits * n > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    top = (1 << bits) - 1
    qs = []
    for c, mn, mx, t in zip(cols, mins, maxs, types or ["double"] * n):
        d = _dbl(c, t)
        if mn is None or mx is None or not (mx > mn):
            qs.append(F.lit(0).cast("long"))
            continue
        q = F.floor((d - F.lit(float(mn))) * F.lit(float(top))
                    / F.lit(float(mx) - float(mn))).cast("long")
        q = F.greatest(F.lit(0), F.least(F.lit(top), q))
        qs.append(F.coalesce(q, F.lit(0)))  # NULL ranks first, stably
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, q in enumerate(qs):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - ci)))
    return z
