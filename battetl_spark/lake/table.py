"""LakeTable — a minimal snapshot-based table format on parquet.

The sandbox has no Iceberg/Delta jars, so the engine ships its own small
lakehouse layer with the properties the CDC sink needs (all public, standard
lakehouse ideas — snapshot isolation via an atomically-swapped metadata
pointer, immutable data files, copy-on-write row rewrite, schema evolution by
metadata, O(1) commit):

- **Snapshots**: JSON files ``metadata/v{N:08d}.json`` created with exclusive
  ``open(..., 'x')`` (optimistic concurrency — a losing writer retries), then
  ``version-hint.txt`` swapped via ``os.replace`` (atomic on POSIX). Readers
  see either the old or the new snapshot, never a torn state.
- **Bucketed layout**: rows are hash-bucketed on a bucket key (``conv_id``)
  into ``num_buckets`` buckets. MERGE rewrites only the buckets a batch
  touches (copy-on-write); untouched buckets' files are carried forward by
  reference. At 100 TB this is what keeps a 1 GB microbatch from rewriting
  the table: cost ∝ touched-bucket bytes, not table bytes.
- **Schema evolution**: each file group records the schema it was written
  with; reads harmonize per group (missing columns → NULL, widened types →
  cast) so old files are never rewritten on ADD COLUMN / type widening.
  (Reference analog: schema-version gate Loader.py:448-493 and the
  ``other_details`` open-schema escape hatch Loader.py:495-524.)
- **Fences**: the snapshot embeds a map of applied (epoch_id → max_lsn,
  per-partition offsets). Fence-check + data commit land in ONE atomic
  snapshot swap ⇒ replaying a committed epoch is a no-op (exactly-once;
  reference analog: 0-row re-load, tests/test_Loader.py:341-343).
- **Lineage**: per-commit row counts / lsn ranges / snapshot id stored in the
  snapshot and queryable as a DataFrame (reference analog: post-load meta
  refresh Loader.py:1245-1281).
- **Zone maps**: each file entry carries per-file min/max stats for the lsn /
  tombstone / event-time / sort-lead columns, harvested from the parquet
  footers at write time. ``scan(filters=...)`` skips files whose range can't
  match, and ``vacuum_tombstones`` rewrites only buckets that may hold a
  qualifying tombstone (Iceberg-manifest / Delta-add-file-stats analog).

Scale notes: metadata is O(num_buckets + files), independent of row count.
On a real deployment the JSON pointer swap would live on a consistent store
(HDFS rename / a catalog service); the protocol is unchanged.
"""

from __future__ import annotations

import copy
import glob
import json
import os
import uuid
from datetime import datetime, timezone
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from battetl_spark.lake.evolution import (
    SchemaCompatibilityError,
    check_schema_compatibility,
)

BUCKET_COL = "__bucket"
LAST_LSN_COL = "_last_lsn"  # row-version column (same name as schemas.py —
DELETED_COL = "_deleted"    # defined here too to avoid a circular import)
_HINT = "version-hint.txt"

# ---------------------------------------------------------------- zone maps
# Per-file min/max column statistics ("zone maps") harvested from the parquet
# footers at write time and stored on each snapshot file entry. They are what
# real lakehouse formats (Iceberg manifests, Delta add-file stats) carry so a
# predicate can skip whole files without opening them — the last big
# read-amplification lever beyond bucket pruning (reference analog: the DB
# index that served the watermark point-lookup, Loader.py:1090-1100).


def _stat_jsonable(v):
    """Footer stat value → JSON-storable comparable, or None if the type
    isn't safely comparable across the JSON round-trip (binary, decimal)."""
    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime):
        # naive isoformat is zero-padded → lexicographic order == time order
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):  # date
        return v.isoformat()
    return None


def _harvest_file_stats(path: str, cols: list[str]) -> tuple[dict, int]:
    """({col: {"min": v, "max": v}}, num_rows) aggregated over a parquet
    file's row-group footer statistics. A column missing stats in ANY row
    group is dropped entirely (conservative: no stats → file is never
    skipped); the exact row count always comes from the footer. Runs in
    EXECUTOR tasks (see ``_harvest_stats_job``) — the write commit ships only
    the metadata-sized stats dicts back to the driver, exactly as Iceberg
    write tasks return per-file stats in their commit messages."""
    import pyarrow.parquet as pq

    agg: dict[str, dict] = {}
    bad: set[str] = set()
    md = pq.ParquetFile(path).metadata
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            name = col.path_in_schema
            if name not in cols or name in bad:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                agg.pop(name, None)
                continue
            mn, mx = _stat_jsonable(st.min), _stat_jsonable(st.max)
            if mn is None or mx is None:
                bad.add(name)
                agg.pop(name, None)
                continue
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"min": mn, "max": mx}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
    return agg, int(md.num_rows)


def _harvest_stats_job(spark: SparkSession, paths: list[str], cols: list[str]) -> dict:
    """Distributed zone-map harvest: footer reads run in executor tasks, the
    driver receives only {path: {col: {min,max}}} — O(files × stat-cols) tiny
    dicts, never file bytes. This keeps the commit path free of driver-side
    per-file work: at 1000 executors × object storage, N footer opens happen
    where the files live instead of serializing through one driver loop.

    ``parallelize`` + ``mapPartitions`` is the one sanctioned RDD use
    (per-partition imperative IO); the work unit is a file PATH, not rows.
    ``_harvest_file_stats`` is resolved by module import INSIDE the task, so
    the job always runs this module's real harvest in the worker process —
    which lets tests stub the driver's copy to pin that the driver never
    harvests."""
    sc = spark.sparkContext
    n_slices = max(1, min(len(paths), sc.defaultParallelism))
    cols = list(cols)

    def part(it):
        from battetl_spark.lake.table import _harvest_file_stats as harvest

        for p in it:
            yield p, harvest(p, cols)

    return dict(sc.parallelize(paths, n_slices).mapPartitions(part).collect())


def _norm_filter_value(val, stat_sample):
    """Filter literal → the stat's comparison domain (datetime literals vs
    isoformat-string stats); None when the types aren't comparable (then the
    file is conservatively kept)."""
    if isinstance(stat_sample, str):
        if isinstance(val, datetime):
            return val.replace(tzinfo=None).isoformat()
        return val if isinstance(val, str) else None
    if isinstance(stat_sample, bool):
        return val if isinstance(val, bool) else None
    if isinstance(stat_sample, (int, float)):
        return val if isinstance(val, (int, float)) and not isinstance(val, bool) else None
    return None


def _file_may_match(entry: dict, filters) -> bool:
    """Can this file contain a row satisfying ALL (col, op, value) filters,
    judging only by its zone-map stats? Missing stats → True (never skip on
    ignorance)."""
    stats = entry.get("stats") or {}
    for col, op, val in filters:
        s = stats.get(col)
        if not s:
            continue
        v = _norm_filter_value(val, s["min"])
        if v is None:
            continue
        mn, mx = s["min"], s["max"]
        if (
            (op == ">" and not mx > v)
            or (op == ">=" and not mx >= v)
            or (op == "<" and not mn < v)
            or (op == "<=" and not mn <= v)
            or (op in ("=", "==") and not mn <= v <= mx)
        ):
            return False
    return True


_FILTER_OPS = {
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "=": lambda c, v: c == v,
    "==": lambda c, v: c == v,
}


class CommitConflict(Exception):
    pass


def _is_fenced(snap: dict, epoch_id: int) -> bool:
    """Epoch already applied? Either folded under the fence floor (see
    ``compact_fences``) or present in the per-epoch fence map."""
    return int(epoch_id) <= int(snap.get("fence_floor", -1)) or str(
        epoch_id
    ) in snap["fences"]


def _bucket_differs(snap_a: dict, snap_b: dict, bucket) -> bool:
    """Did this bucket's file list change between two snapshots? Fast path:
    equal manifest POINTERS prove equal entries (manifests are immutable) —
    an O(1) string compare instead of an O(entries) list compare. Different
    pointers fall back to the entry compare (a rewrite can reproduce
    identical content under a new manifest)."""
    b = str(bucket)
    pa, pb = snap_a.get("manifests"), snap_b.get("manifests")
    if pa is not None and pb is not None and pa.get(b) == pb.get(b) and pa.get(b):
        return False
    return snap_a["files"].get(b) != snap_b["files"].get(b)


def bucket_expr(bucket_key: str, num_buckets: int):
    """Deterministic bucket id for a key — xxhash64-based so any engine stage
    (dedup, merge, scan pruning) derives the same bucket without metadata."""
    return F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(num_buckets)).cast("int")


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta_dir = os.path.join(self.path, "metadata")
        self._data_dir = os.path.join(self.path, "data")
        # immutable manifest files (uuid-named, write-once) → safe to cache
        # per instance; worst case under concurrency is a duplicate read.
        # Bounded LRU (insertion-ordered dict, move-to-end on hit): a
        # long-lived CdcStream writer otherwise holds one superseded entry
        # dict per commit forever — manifests are immutable, so evicting and
        # re-reading on miss is always safe
        self._manifest_cache: dict[str, dict] = {}
        self._manifest_cache_cap = 64

    # ------------------------------------------------------------------ setup
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        num_buckets: int = 16,
        bucket_key: str = "conv_id",
        key_cols: list[str] | None = None,
        sort_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> "LakeTable":
        t = cls(spark, path)
        os.makedirs(t._meta_dir, exist_ok=False)
        os.makedirs(t._data_dir, exist_ok=True)
        snap = {
            "version": 1,
            "snapshot_id": 1,
            "parent": None,
            "schema": json.loads(schema.json()),
            "schemas": {"1": json.loads(schema.json())},
            "current_schema_id": "1",
            "num_buckets": num_buckets,
            "bucket_key": bucket_key,
            "key_cols": key_cols or [],
            "sort_cols": sort_cols or key_cols or [],
            "files": {},  # bucket(str) -> [{"path": rel, "schema_id": str}]
            "fences": {},  # epoch_id(str) -> {"max_lsn": int, "partitions": {...}}
            "lineage": [],  # this commit's lineage rows
            "properties": properties or {},
        }
        t._write_snapshot(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.snapshot()  # raises if absent
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", _HINT))

    # ------------------------------------------------------------- snapshots
    #
    # Manifest-split metadata (Iceberg's snapshot → manifest-list → manifest
    # shape): the root ``v{N}.json`` carries everything EXCEPT file entries —
    # for those it holds only a manifest pointer map (stored inverted as
    # {manifest-path → [bucket ids]}, see ``_expand_manifest_index``). The
    # entries themselves (paths + zone-map stats, the part that grows with
    # file count) live in immutable ``manifests/m-{uuid}.json`` files, one
    # written per commit covering ONLY the buckets that commit touched.
    # Unchanged buckets keep their previous pointer, so per-commit metadata
    # writes are O(touched-bucket entries + num_buckets pointer strings) —
    # never O(table files). Reads hydrate ``snap["files"]`` through a cache
    # of the immutable manifests. Hydrated entry lists are shared with the
    # cache: mutators must REPLACE lists (the codebase convention), never
    # mutate them in place — ``commit`` deepcopies before ``mutate`` for
    # exactly this reason.
    def snapshot(self) -> dict:
        with open(os.path.join(self._meta_dir, _HINT)) as f:
            v = int(f.read().strip())
        with open(os.path.join(self._meta_dir, f"v{v:08d}.json")) as f:
            return self._hydrate(json.load(f))

    @staticmethod
    def _expand_manifest_index(snap: dict) -> dict:
        """Roots store the pointer map INVERTED — {manifest-path: [bucket
        ids]} — because most buckets share a few manifests, so the inverted
        form is O(#manifests × path + num_buckets × int) instead of
        O(num_buckets × path): 233 KB → ~20 KB per root at 4096 buckets
        (measured). In memory the {bucket → path} form is what the reuse /
        diff logic wants, so expand on load."""
        inv = snap.pop("manifests_inv", None)
        if inv is not None and "manifests" not in snap:
            snap["manifests"] = {
                str(b): p for p, bs in inv.items() for b in bs
            }
        return snap

    def _read_manifest(self, rel: str) -> dict:
        m = self._manifest_cache.pop(rel, None)  # pop+reinsert = move to end
        if m is None:
            with open(os.path.join(self._meta_dir, rel)) as f:
                m = json.load(f)
        self._manifest_cache[rel] = m
        while len(self._manifest_cache) > self._manifest_cache_cap:
            self._manifest_cache.pop(next(iter(self._manifest_cache)))
        return m

    def _hydrate(self, snap: dict) -> dict:
        """Materialize ``snap["files"]`` from manifest pointers (no-op for
        legacy snapshots that inlined the file lists)."""
        self._expand_manifest_index(snap)
        if "files" not in snap:
            snap["files"] = {
                b: self._read_manifest(rel)[b]
                for b, rel in snap.get("manifests", {}).items()
            }
        return snap

    def _write_snapshot(self, snap: dict) -> None:
        files = snap.get("files", {})
        ptrs = dict(snap.get("manifests") or {})
        changed: dict[str, list] = {}
        for b, entries in files.items():
            rel = ptrs.get(b)
            if rel is not None and self._read_manifest(rel).get(b) == entries:
                continue  # unchanged bucket: reuse its manifest pointer
            changed[b] = entries
        if changed:
            os.makedirs(os.path.join(self._meta_dir, "manifests"), exist_ok=True)
            rel = os.path.join("manifests", f"m-{uuid.uuid4().hex}.json")
            with open(os.path.join(self._meta_dir, rel), "w") as f:
                json.dump(changed, f)
            self._manifest_cache[rel] = changed
            while len(self._manifest_cache) > self._manifest_cache_cap:
                self._manifest_cache.pop(next(iter(self._manifest_cache)))
            for b in changed:
                ptrs[b] = rel
        snap["manifests"] = {b: p for b, p in ptrs.items() if b in files}
        inv: dict[str, list[int]] = {}
        for b, mp in snap["manifests"].items():
            inv.setdefault(mp, []).append(int(b))
        root = {k: v for k, v in snap.items() if k not in ("files", "manifests")}
        root["manifests_inv"] = {mp: sorted(bs) for mp, bs in inv.items()}
        p = os.path.join(self._meta_dir, f"v{snap['version']:08d}.json")
        with open(p, "x") as f:  # exclusive create = optimistic lock
            json.dump(root, f)
        tmp = os.path.join(self._meta_dir, f".hint.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(tmp, os.path.join(self._meta_dir, _HINT))

    def commit(self, mutate, max_retries: int = 10) -> dict:
        """Optimistic commit: mutate(copy-of-current) -> new snapshot dict
        (or None to abort). Retries on version collision."""
        for _ in range(max_retries):
            cur = self.snapshot()
            new = mutate(copy.deepcopy(cur))
            if new is None:
                return cur
            new["version"] = cur["version"] + 1
            new["snapshot_id"] = new["version"]
            new["parent"] = cur["version"]
            try:
                self._write_snapshot(new)
                return new
            except FileExistsError:
                continue
        raise CommitConflict(f"commit lost {max_retries} races at {self.path}")

    # ---------------------------------------------------------------- schema
    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.snapshot()["schema"])

    @property
    def num_buckets(self) -> int:
        return self.snapshot()["num_buckets"]

    @property
    def bucket_key(self) -> str:
        return self.snapshot()["bucket_key"]

    def evolve_schema(self, incoming: T.StructType) -> T.StructType:
        """Gate + apply schema evolution (adds / safe widenings) atomically.

        Raises SchemaCompatibilityError on incompatible changes — the
        pipeline errors cleanly with no partial commit (FIXTURES.md F6).
        """
        def mutate(snap):
            cur = T.StructType.fromJson(snap["schema"])
            evolved = check_schema_compatibility(cur, incoming)
            if evolved.json() == cur.json():
                return None  # no-op
            sid = str(max(int(k) for k in snap["schemas"]) + 1)
            snap["schemas"][sid] = json.loads(evolved.json())
            snap["schema"] = snap["schemas"][sid]
            snap["current_schema_id"] = sid
            # a column re-added after drop_column() is a NEW column: record
            # the first schema-id whose files may carry its values, so scan
            # masks the dropped predecessor's bytes in older files to NULL
            dropped = dict(snap.get("dropped_cols") or {})
            cur_names = {f.name for f in cur.fields}
            for f in evolved.fields:
                if f.name not in cur_names and f.name in dropped:
                    mins = dict(snap.get("column_min_sid") or {})
                    mins[f.name] = int(sid)
                    snap["column_min_sid"] = mins
                    del dropped[f.name]
                    snap["dropped_cols"] = dropped
            snap["lineage"] = []
            return snap

        return T.StructType.fromJson(self.commit(mutate)["schema"])

    def rename_column(self, old: str, new: str) -> T.StructType:
        """Rename a column by metadata only — no file rewrite (Iceberg
        RENAME COLUMN analog). Old files keep the bytes under the old name;
        ``column_aliases`` records the rename sid so scan's per-schema-id
        harmonize selects the right stored name per file group (renames
        chain). Key/bucket/sort/internal columns are refused; the target
        name must be free.

        A later batch still carrying the OLD name evolves it back as a NEW
        column (old files' bytes masked to NULL, exactly like a dropped
        name being re-added) — producers are expected to switch to the new
        name; a non-nullable renamed column forces that at the gate.
        Returns the evolved schema."""

        def mutate(snap):
            cur = T.StructType.fromJson(snap["schema"])
            names = [f.name for f in cur.fields]
            if old not in names:
                raise ValueError(f"column {old!r} does not exist")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            if not new or new.startswith("_"):
                raise ValueError(f"invalid target column name {new!r}")
            protected = set(snap.get("key_cols") or [])
            protected.add(snap["bucket_key"])
            protected |= set(snap.get("sort_cols") or [])
            protected |= set(
                snap.get("properties", {}).get("protected_cols", []) or []
            )
            if old.startswith("_") or old in protected:
                raise ValueError(
                    f"column {old!r} is a key/bucket/sort/internal column "
                    "and cannot be renamed"
                )
            evolved = T.StructType([
                T.StructField(new, f.dataType, f.nullable) if f.name == old else f
                for f in cur.fields
            ])
            sid = str(max(int(k) for k in snap["schemas"]) + 1)
            snap["schemas"][sid] = json.loads(evolved.json())
            snap["schema"] = snap["schemas"][sid]
            snap["current_schema_id"] = sid
            aliases = dict(snap.get("column_aliases") or {})
            chain = list(aliases.pop(old, []))
            chain.append([int(sid), old])
            aliases[new] = chain
            snap["column_aliases"] = aliases
            mins = dict(snap.get("column_min_sid") or {})
            if old in mins:
                mins[new] = mins.pop(old)  # drop/re-add mask travels with it
            else:
                mins.pop(new, None)  # a stale mask from new's prior life
            snap["column_min_sid"] = mins
            dropped = dict(snap.get("dropped_cols") or {})
            dropped[old] = int(sid)  # old name re-carried later = NEW column
            dropped.pop(new, None)
            snap["dropped_cols"] = dropped
            # remap name-bearing properties: a zone-mapped column keeps its
            # stats under the new name (otherwise _stats_cols filters the
            # stale old name out and file skipping silently stops)
            props = dict(snap.get("properties") or {})
            listed = list(props.get("stats_cols", []) or [])
            if old in listed:
                props["stats_cols"] = [new if c == old else c for c in listed]
                snap["properties"] = props
            snap["lineage"] = []
            return snap

        return T.StructType.fromJson(self.commit(mutate)["schema"])

    def drop_column(self, name: str) -> T.StructType:
        """Drop a column by metadata only — no file rewrite (Iceberg DROP
        COLUMN analog). Existing files keep the bytes; the column simply
        leaves the current schema, so scans stop selecting it and incoming
        batches no longer carry it through ``_project``. Key, bucket, sort
        and engine-internal (``_``-prefixed) columns are refused.

        Re-adding the same name later (explicitly, or implicitly by a
        batch that still carries the column — it evolves back in) creates
        a NEW column: files written before the re-add read NULL for it,
        never the dropped predecessor's stored values (tracked via
        ``column_min_sid``; realized per schema-id read group in scan).
        Returns the evolved schema."""

        def mutate(snap):
            cur = T.StructType.fromJson(snap["schema"])
            if name not in {f.name for f in cur.fields}:
                raise ValueError(f"column {name!r} does not exist")
            protected = set(snap.get("key_cols") or [])
            protected.add(snap["bucket_key"])
            protected |= set(snap.get("sort_cols") or [])
            protected |= set(
                snap.get("properties", {}).get("protected_cols", []) or []
            )
            if name.startswith("_") or name in protected:
                raise ValueError(
                    f"column {name!r} is a key/bucket/sort/internal column "
                    "and cannot be dropped"
                )
            evolved = T.StructType([f for f in cur.fields if f.name != name])
            sid = str(max(int(k) for k in snap["schemas"]) + 1)
            snap["schemas"][sid] = json.loads(evolved.json())
            snap["schema"] = snap["schemas"][sid]
            snap["current_schema_id"] = sid
            dropped = dict(snap.get("dropped_cols") or {})
            dropped[name] = int(sid)
            snap["dropped_cols"] = dropped
            snap["lineage"] = []
            return snap

        return T.StructType.fromJson(self.commit(mutate)["schema"])

    # ------------------------------------------------------------------ read
    def scan(
        self,
        buckets: list[int] | None = None,
        snap: dict | None = None,
        include_deleted: bool = False,
        filters: list[tuple] | None = None,
    ) -> DataFrame:
        """Read current rows (optionally only the given buckets), harmonized
        to the current schema. Missing columns in old files → NULL; widened
        types → cast. Per-group reads keep the parquet vectorized reader on
        the exact written schema (no cross-file type confusion).

        Tombstone rows (``_deleted = true``) are filtered unless
        ``include_deleted`` — merge reads them for late-event fencing.

        ``filters`` is a list of ``(col, op, value)`` with op in
        ``> >= < <= =``: each is applied BOTH as zone-map file skipping
        (files whose per-file min/max range cannot satisfy every predicate
        are never opened — read cost ∝ qualifying-file bytes) AND as a row
        filter, so the semantics are exact regardless of which files carry
        stats. A ``ts``- or ``_last_lsn``-bounded scan of a 100 TB table
        touches only the files whose range overlaps.

        Merge-on-read: buckets holding DELTA files (``merge_apply(mode=
        'mor')`` appends batch winners without reading the bucket) are
        resolved here — one winner per key by (lsn, base-beats-delta-on-tie)
        — before tombstone/row filters. PER-FILE zone-map skipping is
        disabled for those buckets (dropping one file could remove the true
        winner and wrongly promote an older row past the filter), but the
        WHOLE bucket is skipped when no file in it — base or delta, stats
        over their union of ranges — can satisfy every predicate: any
        resolved winner is a row of the bucket, so if zone maps prove no
        bucket row matches, no winner can survive the post-resolve row
        filter either. A 100-TB MOR-heavy table thus keeps file skipping on
        its hottest (delta-bearing) buckets at bucket granularity until
        compaction restores per-file skipping. Clean (all-base) buckets keep
        the fast path: no resolve aggregation, per-file skipping."""
        snap = snap or self.snapshot()
        cur_schema = T.StructType.fromJson(snap["schema"])
        wanted = list(
            snap["files"].items()
            if buckets is None
            else ((str(b), snap["files"].get(str(b), [])) for b in buckets)
        )
        for col, op, _ in filters or []:
            if op not in _FILTER_OPS:
                raise ValueError(f"unsupported filter op {op!r} on {col!r}")

        field_names = {f.name for f in cur_schema.fields}
        ftypes = {f.name: f.dataType for f in cur_schema.fields}

        # drop/re-add lineage: a column re-added after drop_column() is a
        # NEW column — files written before its ``column_min_sid`` still
        # store the OLD column's bytes under the same name and must read
        # NULL (Iceberg's field-id semantics, realized here per schema-id
        # group; no file is rewritten)
        col_min_sid = {
            k: int(v) for k, v in (snap.get("column_min_sid") or {}).items()
        }
        # rename lineage: aliases[current_name] = [[sid, stored_name], ...]
        # (ascending sid) — files written before the first entry's sid store
        # the column under that entry's old name; renames chain
        aliases = snap.get("column_aliases") or {}

        def stored_name(name, g):
            for sid_at, old in aliases.get(name, []):
                if g < int(sid_at):
                    return old
            return name

        def harmonize(df, sid):
            g = int(sid)
            cols = []
            for f in cur_schema.fields:
                src = stored_name(f.name, g)
                if src in df.columns and g >= col_min_sid.get(f.name, 0):
                    cols.append(F.col(src).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            return df.select(*cols)

        def read_union(groups):  # {sid: [paths]} -> harmonized union | None
            parts = []
            for sid, paths in groups.items():
                g_schema = T.StructType.fromJson(snap["schemas"][sid])
                parts.append(
                    harmonize(self.spark.read.schema(g_schema).parquet(*paths), sid)
                )
            return reduce(lambda a, b: a.unionByName(b), parts) if parts else None

        clean: dict[str, list[str]] = {}
        # delta-bearing buckets: base files + delta files grouped per
        # (schema, commit-seq) so the resolve can prefer the EARLIEST commit
        # on lsn ties (deterministic; CoW-parity)
        base_g: dict[str, list[str]] = {}
        delta_g: dict[tuple, list[str]] = {}  # (sid, seq) -> paths
        for _, entries in wanted:
            has_delta = any(e.get("delta") for e in entries)
            if (
                has_delta
                and filters
                and not any(_file_may_match(e, filters) for e in entries)
            ):
                continue  # bucket-granular skip: no file (base OR delta) in
                # this bucket can hold a matching row, so no resolved winner
                # can pass the row filter — safe to drop the whole bucket
            for e in entries:
                full = os.path.join(self.path, e["path"])
                if not has_delta:
                    if filters and not _file_may_match(e, filters):
                        continue  # zone-map skip: range proves no row matches
                    clean.setdefault(e["schema_id"], []).append(full)
                elif e.get("delta"):
                    delta_g.setdefault(
                        (e["schema_id"], int(e.get("seq", 1))), []
                    ).append(full)
                else:
                    base_g.setdefault(e["schema_id"], []).append(full)

        out = read_union(clean)
        if delta_g or base_g:
            key_cols = snap["key_cols"]
            if not key_cols or LAST_LSN_COL not in field_names:
                raise ValueError(
                    "delta files require a keyed CDC table to resolve"
                )
            parts = []
            base_df = read_union(base_g)
            if base_df is not None:
                parts.append(base_df.withColumn("__seq", F.lit(0)))
            for (sid, seq), paths in delta_g.items():
                d = read_union({sid: paths})
                parts.append(d.withColumn("__seq", F.lit(seq)))
            merged = reduce(lambda a, b: a.unionByName(b), parts)
            non_key = [f.name for f in cur_schema.fields if f.name not in key_cols]
            # max lsn wins; on a tie the EARLIEST-applied row wins (base
            # __seq=0 beats any delta; older delta beats newer) — a replayed
            # or duplicate event at the applied lsn is a no-op, exactly as
            # in the CoW resolve
            order = F.struct(F.col(LAST_LSN_COL), (-F.col("__seq")).alias("__prio"))
            resolved = (
                merged.groupBy(*key_cols)
                .agg(F.max_by(F.struct(*non_key), order).alias("__w"))
                .select(
                    *key_cols, *[F.col(f"__w.{c}").alias(c) for c in non_key]
                )
                .select(*[f.name for f in cur_schema.fields])
            )
            out = resolved if out is None else out.unionByName(resolved)
        if out is None:
            return self.spark.createDataFrame([], cur_schema)
        if not include_deleted and "_deleted" in field_names:
            out = out.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        for col, op, val in filters or []:
            lit = F.lit(val)
            if col in ftypes:
                lit = lit.cast(ftypes[col])  # e.g. datetime literal vs ntz col
            out = out.filter(_FILTER_OPS[op](F.col(col), lit))
        return out

    def to_df(self) -> DataFrame:
        return self.scan()

    def count_rows(self, _debug: bool = False):
        """Exact VISIBLE row count, metadata-first (the Iceberg/Delta
        count-star pushdown): per-file footer row counts were harvested at
        write time (``nrows``), so a file provably free of tombstones — its
        ``_deleted`` zone map shows no True, or the table has no tombstone
        column at all — contributes without being opened. Only files that
        MIGHT hold tombstones (or predate nrows harvesting) are scanned,
        and only delta-bearing buckets pay a resolve. On a 100-TB table
        count(*) is then O(metadata) + O(the exceptional files), not a
        full scan. Returns an int; ``_debug`` returns
        (total, n_meta_files, n_slow_files, n_slow_buckets) for tests."""
        snap = self._hydrate(self.snapshot())
        has_tombstones = DELETED_COL in {f.name for f in self.schema.fields}
        total = 0
        n_meta = 0
        slow_buckets: list[int] = []
        slow_paths: list[str] = []
        for b, entries in snap["files"].items():
            if any(e.get("delta") for e in entries):
                slow_buckets.append(int(b))
                continue
            for e in entries:
                nr = e.get("nrows")
                st = (e.get("stats") or {}).get(DELETED_COL)
                clean = (not has_tombstones) or (
                    st is not None and st["max"] is False
                )
                if nr is not None and clean:
                    total += int(nr)
                    n_meta += 1
                else:
                    slow_paths.append(os.path.join(self.path, e["path"]))
        if slow_buckets:
            total += self.scan(slow_buckets, snap).count()
        if slow_paths:
            df = self.spark.read.parquet(*slow_paths)
            if has_tombstones and DELETED_COL in df.columns:
                df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
            total += df.count()
        if _debug:
            return total, n_meta, len(slow_paths), len(slow_buckets)
        return total

    # ----------------------------------------------------------------- write
    def _write_data(
        self,
        df: DataFrame,
        target_partitions: int | None = None,
        files_per_bucket: int = 4,
        shuffle: bool = True,
        cluster_by: str | None = None,
        cluster_sort: list | None = None,
        max_records_per_file: int | None = None,
    ) -> dict[str, list[str]]:
        """Write rows (must carry BUCKET_COL) into a fresh commit dir,
        one hive-style subdir per bucket; returns {bucket: [rel paths]}.

        sortWithinPartitions enforces the stable-ordering invariant
        (per-turn text equality under stable turn ordering) at rest.

        ``cluster_by`` (clustered-compaction path): instead of the key-salt
        split, each bucket flows through one task sorted by ``cluster_by``
        and the writer rolls a new file every ``max_records_per_file``
        records — so a bucket's files hold CONTIGUOUS, DISJOINT cluster_by
        ranges and its zone maps actually skip (the salt split gives every
        file the bucket's full value range; see ``compact``).
        """
        snap = self.snapshot()
        sort_cols = snap["sort_cols"] or []
        commit_dir = f"commit-{uuid.uuid4().hex}"
        out = os.path.join(self._data_dir, commit_dir)
        # Hash-partition on (bucket, small key-salt): each (bucket, salt)
        # combo lands in exactly one task, so a bucket writes to <= SALTS
        # files, a hot bucket splits across SALTS tasks, and rows balance by
        # the hash — with NO sampling pass (repartitionByRange samples its
        # child, executing the whole upstream merge pipeline twice; measured
        # 17% slower). Hash by bucket alone idles ~40% of cores (collisions);
        # hash by (bucket, full key) writes n_out × B tiny files.
        lead_sort: list = []  # Column exprs sorted ahead of sort_cols
        if cluster_by or cluster_sort:
            # clustered / Z-ordered compaction: one task per bucket sorted
            # by the cluster key (a plain column, or a Morton expression —
            # ``cluster_sort`` — that never materializes into the file)
            n_out = target_partitions or max(
                1, df.sparkSession.sparkContext.defaultParallelism * 2
            )
            w = df.repartition(n_out, F.col(BUCKET_COL))
            if cluster_sort:
                lead_sort = list(cluster_sort)
            else:
                sort_cols = [cluster_by] + [c for c in sort_cols if c != cluster_by]
        elif shuffle:
            n_out = target_partitions or max(
                1, df.sparkSession.sparkContext.defaultParallelism * 2
            )
            lead = (sort_cols or [BUCKET_COL])[0]
            # seeded independently of bucket_expr: pmod(xxhash64(key), B) and
            # pmod(xxhash64(key), S) are correlated when S divides B (the salt
            # would collapse to bucket % S and never split a bucket)
            salt = F.pmod(
                F.xxhash64(F.col(lead), F.lit(0x5A17)), F.lit(max(1, files_per_bucket))
            )
            w = df.repartition(n_out, F.col(BUCKET_COL), salt)
        else:
            # caller guarantees rows are already usefully partitioned (e.g.
            # rebucket: child bucket is a refinement of the parent the task
            # read) — partitionBy fans each task into its buckets' dirs
            w = df
        if sort_cols or lead_sort:
            w = w.sortWithinPartitions(BUCKET_COL, *lead_sort, *sort_cols)
        writer = w.write.partitionBy(BUCKET_COL).mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        writer.parquet(out)
        stat_cols = self._stats_cols(snap, df.columns)
        paths = glob.glob(os.path.join(out, f"{BUCKET_COL}=*", "*.parquet"))
        # zone-map harvest runs as ONE distributed job over the written file
        # paths (executor-side footer reads); only the stats dicts come back
        all_stats: dict[str, tuple] = {}
        if stat_cols and paths:
            all_stats = _harvest_stats_job(self.spark, paths, stat_cols)
        files: dict[str, list[dict]] = {}
        for p in paths:
            b = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
            entry = {"path": os.path.relpath(p, self.path)}
            harvested = all_stats.get(p)
            if harvested is not None:
                stats, nrows = harvested
                if stats:
                    entry["stats"] = stats
                entry["nrows"] = nrows
            files.setdefault(b, []).append(entry)
        return files

    def _stats_cols(self, snap: dict, df_cols: list[str]) -> list[str]:
        """Columns to zone-map: the row-version lsn, the tombstone flag, the
        event-time column, and the sort-lead key (plus any extras from the
        ``stats_cols`` table property)."""
        lead = (snap.get("sort_cols") or [None])[0]
        cand = {LAST_LSN_COL, DELETED_COL, "ts", lead}
        cand |= set(snap.get("properties", {}).get("stats_cols", []) or [])
        return sorted(c for c in cand if c and c in df_cols and c != BUCKET_COL)

    def replace_buckets(
        self,
        df: DataFrame,
        buckets: list[int],
        fence: dict | None = None,
        lineage: list[dict] | None = None,
        target_partitions: int | None = None,
        files_per_bucket: int = 4,
        base_snapshot: dict | None = None,
        cluster_by: str | None = None,
        cluster_sort: list | None = None,
        max_records_per_file: int | None = None,
    ) -> dict | None:
        """Copy-on-write commit: the given buckets' contents become exactly
        ``df`` (which must carry BUCKET_COL); all other buckets carry over.
        ``fence`` = {"epoch_id": int, "max_lsn": int, ...} recorded atomically
        with the data swap.

        ``base_snapshot`` is the snapshot ``df`` was COMPUTED from. Passing it
        turns the optimistic retry into true conflict detection: if any
        replaced bucket's file list changed between base and commit time
        (a concurrent writer landed first), the commit raises CommitConflict
        instead of silently overwriting the winner's rows with data derived
        from a stale scan. Disjoint-bucket concurrent commits still compose.
        Files written under the base schema are tagged with the BASE
        schema_id (a concurrent evolve_schema must not re-tag them — old
        files are harmonized on read, never relabeled).

        Returns None (no commit) when ``fence``'s epoch is already applied —
        exactly-once replay no-op; callers must treat it as not-applied.
        """
        new_files = self._write_data(
            df,
            target_partitions,
            files_per_bucket,
            cluster_by=cluster_by,
            cluster_sort=cluster_sort,
            max_records_per_file=max_records_per_file,
        )

        replaced = {int(b) for b in buckets}
        sid = (base_snapshot or self.snapshot())["current_schema_id"]
        state = {"fenced": False}

        def mutate(snap):
            state["fenced"] = False
            if fence is not None and _is_fenced(snap, fence["epoch_id"]):
                state["fenced"] = True
                return None  # already committed — exactly-once replay no-op
            if base_snapshot is not None and snap["version"] != base_snapshot["version"]:
                for b in replaced:
                    if _bucket_differs(snap, base_snapshot, b):
                        raise CommitConflict(
                            f"bucket {b} changed since snapshot version "
                            f"{base_snapshot['version']} (now {snap['version']}); "
                            "re-run the merge against the current snapshot"
                        )
            for b in replaced:
                snap["files"][str(b)] = [
                    {**e, "schema_id": sid} for e in new_files.get(str(b), [])
                ]
            for b_str, entries in new_files.items():
                if int(b_str) not in replaced:  # defensive: stray bucket → append
                    snap["files"][b_str] = snap["files"].get(b_str, []) + [
                        {**e, "schema_id": sid} for e in entries
                    ]
            if fence is not None:
                snap["fences"][str(fence["epoch_id"])] = {
                    k: v for k, v in fence.items() if k != "epoch_id"
                }
            snap["lineage"] = lineage or []
            return snap

        out = self.commit(mutate)
        if state["fenced"]:
            return None  # orphan data files reclaimed by vacuum_files
        return out

    def append_delta_buckets(
        self,
        df: DataFrame,
        fence: dict | None = None,
        lineage: list[dict] | None = None,
        target_partitions: int | None = None,
        files_per_bucket: int = 4,
        schema_id: str | None = None,
    ) -> dict | None:
        """Merge-on-read commit: append ``df`` (batch winners carrying
        BUCKET_COL, ``_last_lsn`` and ``_deleted``) as DELTA files on their
        buckets, WITHOUT reading or rewriting any existing file. Write cost
        ∝ batch bytes — the ingest-side answer to CoW's touched-bucket
        rewrite at 100 TB; reads of delta-bearing buckets pay a per-key LWW
        resolve until ``compact()`` folds deltas back into base files.

        Append-only metadata mutation: concurrent delta appends to the same
        bucket commute (the optimistic commit retry re-applies the append on
        the fresh list), so no conflict detection is needed. The fence is
        honored exactly like replace_buckets: a replayed epoch returns None
        and commits nothing."""
        snap = self.snapshot()
        if not snap["key_cols"] or LAST_LSN_COL not in {
            f["name"] for f in snap["schema"]["fields"]
        }:
            raise ValueError("merge-on-read requires a keyed CDC table")
        new_files = self._write_data(df, target_partitions, files_per_bucket)
        state = {"fenced": False}

        def mutate(s):
            state["fenced"] = False
            if fence is not None and _is_fenced(s, fence["epoch_id"]):
                state["fenced"] = True
                return None  # exactly-once replay no-op
            sid = schema_id or s["current_schema_id"]
            # "seq" = the committing snapshot's version: scan's resolve uses
            # it to break delta-vs-delta lsn ties deterministically in favor
            # of the FIRST-applied commit (parity with CoW's current-row-wins
            # tie rule; max_by alone would pick an arbitrary winner)
            seq = s["version"] + 1
            for b_str, entries in new_files.items():
                s["files"][b_str] = s["files"].get(b_str, []) + [
                    {**e, "schema_id": sid, "delta": True, "seq": seq}
                    for e in entries
                ]
            if fence is not None:
                s["fences"][str(fence["epoch_id"])] = {
                    k: v for k, v in fence.items() if k != "epoch_id"
                }
            s["lineage"] = lineage or []
            return s

        out = self.commit(mutate)
        if state["fenced"]:
            return None  # orphan files reclaimed by vacuum_files
        return out

    def append(self, df: DataFrame, lineage: list[dict] | None = None) -> dict:
        """Append-only commit (seeding / fact-append use; reference analog:
        chunked INSERT Loader.py:1149-1205 — here one distributed write).

        Refused while any bucket holds MOR delta files: an appended row
        landing in a delta-bearing bucket would silently enter that bucket's
        read-time LWW resolve (and could lose to a delta and vanish), while
        the identical append into a clean bucket would surface both rows —
        visibility must not depend on unrelated MOR activity. Fold deltas
        with compact() first, or route the rows through merge_apply."""
        snap = self.snapshot()
        if snap["key_cols"] and any(
            e.get("delta") for entries in snap["files"].values() for e in entries
        ):
            raise ValueError(
                "append() into a table with outstanding MOR delta files is "
                "ambiguous — run compact() to fold deltas, or use merge_apply"
            )
        bexpr = bucket_expr(snap["bucket_key"], snap["num_buckets"])
        new_files = self._write_data(df.withColumn(BUCKET_COL, bexpr))

        def mutate(s):
            for b_str, new_entries in new_files.items():
                entries = [
                    {**e, "schema_id": s["current_schema_id"]} for e in new_entries
                ]
                s["files"][b_str] = s["files"].get(b_str, []) + entries
            s["lineage"] = lineage or []
            return s

        return self.commit(mutate)

    # ----------------------------------------------------------- fence/meta
    def has_fence(self, epoch_id: int) -> bool:
        return _is_fenced(self.snapshot(), epoch_id)

    def fences(self) -> dict:
        return self.snapshot()["fences"]

    def fence_floor(self) -> int:
        """Highest epoch folded into the fence floor (-1 if none): every
        epoch ≤ floor is fenced without a per-epoch map entry."""
        return int(self.snapshot().get("fence_floor", -1))

    def compact_fences(self) -> dict | None:
        """Fold the maximal CONTIGUOUS fenced epoch prefix into a single
        ``fence_floor`` watermark, dropping those epochs' map entries.

        The fence map otherwise grows one entry per epoch forever — at
        10^10 events / 10^5 epochs that is megabytes of fence JSON copied
        into every snapshot root, the same O(history) metadata leak the
        manifest split removed for file lists. Folding is unconditionally
        safe: only epochs whose every predecessor is also fenced fold, so
        ``has_fence`` answers identically before and after (a gap epoch —
        never applied — stops the fold and is never spuriously fenced).
        Per-epoch fence payloads (max_lsn, partition offsets) are dropped
        for folded epochs; the lineage history in older snapshots keeps
        them until vacuum. Returns the new snapshot, or None if nothing
        folded. Safe to call periodically from a maintenance loop."""
        state = {"folded": False}

        def mutate(snap):
            state["folded"] = False
            floor = int(snap.get("fence_floor", -1))
            fenced = {int(k) for k in snap["fences"]}
            new_floor = floor
            while new_floor + 1 in fenced:
                new_floor += 1
            if new_floor == floor:
                return None
            snap["fence_floor"] = new_floor
            snap["fences"] = {
                k: v for k, v in snap["fences"].items() if int(k) > new_floor
            }
            snap["lineage"] = []
            state["folded"] = True
            return snap

        out = self.commit(mutate)
        return out if state["folded"] else None

    # ------------------------------------------------------------ time travel
    def snapshot_at(self, version: int | str) -> dict:
        """Snapshot by version number, or by TAG NAME (str)."""
        if isinstance(version, str):
            tags = self.snapshot().get("tags") or {}
            if version not in tags:
                raise ValueError(f"tag {version!r} does not exist")
            version = int(tags[version])
        p = os.path.join(self._meta_dir, f"v{version:08d}.json")
        if not os.path.exists(p):
            raise ValueError(f"snapshot version {version} does not exist")
        with open(p) as f:
            return self._hydrate(json.load(f))

    def scan_at(self, version: int | str, include_deleted: bool = False) -> DataFrame:
        """Time travel: read the table as of an earlier snapshot — by
        version number or tag name (data files are immutable; UNTAGGED
        history lives until vacuum_files drops it, tagged versions are
        vacuum-protected)."""
        return self.scan(snap=self.snapshot_at(version), include_deleted=include_deleted)

    # ------------------------------------------------------------------- tags
    def tag(self, name: str, version: int | None = None, replace: bool = False) -> int:
        """Pin an immutable named tag to a snapshot version (default: the
        current one) — the reproducible-training-dataset primitive (Iceberg
        tag analog): a run records ``table.tag("train-v3")`` and every later
        job reads ``scan_at("train-v3")`` byte-identically, regardless of
        subsequent ingest, compaction, or vacuum. Tags live in the snapshot
        root (transactional with everything else; the tag commit itself is
        metadata-only and reuses all manifest pointers) and ``vacuum_files``
        retains every tagged version's metadata + data files. Returns the
        tagged version."""
        state: dict = {}

        def mutate(snap):
            v = snap["version"] if version is None else int(version)
            p = os.path.join(self._meta_dir, f"v{v:08d}.json")
            if version is not None and not os.path.exists(p):
                raise ValueError(f"snapshot version {v} does not exist")
            tags = dict(snap.get("tags") or {})
            if name in tags and not replace:
                if int(tags[name]) == v:
                    state["version"] = v
                    return None  # already pinned there — idempotent no-op
                raise ValueError(
                    f"tag {name!r} already pins v{tags[name]} (replace=True to move)"
                )
            tags[name] = v
            snap["tags"] = tags
            snap["lineage"] = []
            state["version"] = v
            return snap

        self.commit(mutate)
        return state["version"]

    def tags(self) -> dict[str, int]:
        return {k: int(v) for k, v in (self.snapshot().get("tags") or {}).items()}

    def delete_tag(self, name: str) -> None:
        def mutate(snap):
            tags = dict(snap.get("tags") or {})
            if name not in tags:
                return None
            del tags[name]
            snap["tags"] = tags
            snap["lineage"] = []
            return snap

        self.commit(mutate)

    def rollback(self, version: int) -> dict:
        """Roll the table back to an earlier snapshot's state as a NEW
        commit (history preserved — the rollback itself is undoable).
        Fences are kept from the CURRENT snapshot: epochs applied since
        ``version`` stay fenced, so a stream resuming after rollback does
        not double-apply them."""
        old = self.snapshot_at(version)

        def mutate(snap):
            snap["files"] = old["files"]
            # carrying the old manifest pointers lets _write_snapshot reuse
            # them: a rollback commit writes NO new manifests
            if "manifests" in old:
                snap["manifests"] = old["manifests"]
            else:
                snap.pop("manifests", None)  # legacy inline-files snapshot
            snap["schema"] = old["schema"]
            snap["schemas"] = {**old["schemas"], **snap["schemas"]}
            snap["current_schema_id"] = old["current_schema_id"]
            snap["lineage"] = []
            return snap

        return self.commit(mutate)

    def changes_between(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change-data-feed: the rows inserted/updated/deleted between two
        snapshots, as current-schema rows plus a ``_change_type`` column
        ('insert' | 'update' | 'delete'; delete rows carry the key columns
        and the tombstone LSN). Lets downstream consumers tail the table
        incrementally instead of re-diffing full states.

        Scale shape: the snapshot metadata says exactly which buckets' file
        lists differ between the two versions, so only CHANGED buckets are
        scanned on either side — diff cost ∝ changed-bucket bytes, never
        table bytes."""
        old_snap = self.snapshot_at(v_from)
        new_snap = self.snapshot() if v_to is None else self.snapshot_at(v_to)

        # validation FIRST: a non-CDC table must raise loudly regardless of
        # whether any bucket changed (an append-only table with real changes
        # must never silently return an empty feed)
        def names(snap):
            return {f["name"] for f in snap["schema"]["fields"]}

        key_cols = new_snap["key_cols"]
        if not key_cols:
            raise ValueError(
                "changes_between requires a keyed CDC table (key_cols is "
                "empty); append-only tables have no row identity to diff on"
            )
        for snap, v in ((old_snap, v_from), (new_snap, v_to)):
            if LAST_LSN_COL not in names(snap):
                raise ValueError(
                    f"changes_between requires a CDC table (no {LAST_LSN_COL} "
                    f"column at version {v}); append-only tables have no row "
                    "version to diff on"
                )

        changed = sorted(
            int(b)
            for b in set(old_snap["files"]) | set(new_snap["files"])
            if _bucket_differs(old_snap, new_snap, b)
        )
        if not changed:
            return self.spark.createDataFrame(
                [], T.StructType(
                    list(T.StructType.fromJson(new_snap["schema"]).fields)
                    + [T.StructField("_change_type", T.StringType(), False)]
                )
            )

        def dead_expr(snap):
            if DELETED_COL in names(snap):
                return F.coalesce(F.col(DELETED_COL), F.lit(False))
            return F.lit(False)

        old = self.scan(changed, old_snap, include_deleted=True).select(
            *[F.col(c).alias(f"__o_{c}") for c in key_cols],
            F.col(LAST_LSN_COL).alias("__o_lsn"),
            dead_expr(old_snap).alias("__o_dead"),
        )
        new = self.scan(changed, new_snap, include_deleted=True)
        cond = reduce(
            lambda a, b: a & b,
            [new[c].eqNullSafe(F.col(f"__o_{c}")) for c in key_cols],
        )
        j = new.join(old, cond, "full_outer")
        new_dead = (
            F.coalesce(F.col(DELETED_COL), F.lit(False))
            if DELETED_COL in new.columns
            else F.lit(False)
        )
        new_lsn = F.col(LAST_LSN_COL)
        was_live = F.col("__o_lsn").isNotNull() & ~F.col("__o_dead")
        change = (
            F.when(~was_live & new_lsn.isNotNull() & ~new_dead, "insert")
            .when(was_live & new_lsn.isNotNull() & new_dead, "delete")
            .when(
                was_live
                & new_lsn.isNotNull()
                & ~new_dead
                & (new_lsn > F.col("__o_lsn")),
                "update",
            )
            .otherwise(F.lit(None))
        )
        out_cols = [f.name for f in T.StructType.fromJson(new_snap["schema"]).fields]
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*[new[c] for c in out_cols], "_change_type")
        )

    # ------------------------------------------------------------ maintenance
    def compact(
        self,
        min_files_per_bucket: int = 4,
        cluster_by: str | list[str] | None = None,
        files_per_bucket: int = 1,
    ) -> dict | None:
        """Rewrite buckets whose file count exceeded the threshold into one
        file each (copy-on-write; snapshot-atomic). Long-running CDC streams
        accrete one file per bucket per commit — compaction bounds read
        amplification. Returns the new snapshot, or None if nothing to do.

        ``cluster_by``: clustered compaction (Delta OPTIMIZE ZORDER /
        Iceberg sort-compaction analog). The hot write path salt-splits a
        bucket's files by KEY hash, so every file spans the bucket's full
        ``ts``/sort range and zone maps rarely skip; clustered compaction
        rewrites each crowded bucket as ``files_per_bucket`` files holding
        contiguous DISJOINT ``cluster_by`` ranges (one sorted pass per
        bucket, files split by record-count rollover — no sampling pass).
        A range-filtered scan of a 100 TB table then opens only the files
        whose range overlaps instead of every file of every qualifying
        bucket. ``cluster_by`` is persisted into the ``stats_cols`` table
        property first, so this and every FUTURE write harvests its
        min/max.

        A LIST of 2+ columns Z-ORDERS instead (Delta OPTIMIZE ZORDER BY):
        each crowded bucket is rewritten sorted by the Morton interleave
        of the columns' quantized ranks (``lake.zorder``), so its files
        are simultaneously range-tight in EVERY listed dimension and the
        existing per-column zone maps skip on any of them. Quantization
        ranges come from one partial-aggregated pass over the rows being
        rewritten — no sampling, the pipeline executes once."""
        zorder_cols: list[str] | None = None
        if isinstance(cluster_by, (list, tuple)):
            if len(cluster_by) == 1:
                cluster_by = cluster_by[0]
            else:
                zorder_cols = [str(c) for c in cluster_by]
                cluster_by = None
        snap = self.snapshot()
        if zorder_cols:
            from battetl_spark.lake.zorder import check_zorderable

            check_zorderable(self.schema, zorder_cols)
            for c in zorder_cols:
                self._ensure_stats_col(c)
            snap = self.snapshot()
        if cluster_by:
            if cluster_by not in {f["name"] for f in snap["schema"]["fields"]}:
                raise ValueError(f"cluster_by column {cluster_by!r} not in schema")
            self._ensure_stats_col(cluster_by)
            snap = self.snapshot()
        crowded = [
            int(b) for b, entries in snap["files"].items()
            if len(entries) >= min_files_per_bucket
        ]
        if not crowded:
            return None
        rows = self.scan(crowded, snap, include_deleted=True).withColumn(
            BUCKET_COL, bucket_expr(snap["bucket_key"], snap["num_buckets"])
        )
        # unsalted, one partition per bucket → one output file per bucket;
        # base_snapshot makes a racing merge abort THIS rewrite (CommitConflict)
        # instead of resurrecting pre-merge rows
        if not cluster_by and not zorder_cols:
            return self.replace_buckets(
                rows, crowded, target_partitions=len(crowded), files_per_bucket=1,
                base_snapshot=snap,
            )
        rows = rows.persist()
        try:
            mx = rows.groupBy(BUCKET_COL).count().agg(F.max("count")).first()[0]
            if mx is None:
                return None
            cluster_sort = None
            if zorder_cols:
                from battetl_spark.lake.zorder import column_ranges, zorder_key

                mins, maxs = column_ranges(rows, zorder_cols)
                types = [
                    f.dataType.simpleString()
                    for c in zorder_cols
                    for f in rows.schema.fields if f.name == c
                ]
                cluster_sort = [
                    zorder_key(zorder_cols, mins, maxs, types=types)
                ]
            return self.replace_buckets(
                rows,
                crowded,
                target_partitions=len(crowded),
                base_snapshot=snap,
                cluster_by=cluster_by,
                cluster_sort=cluster_sort,
                max_records_per_file=-(-int(mx) // max(1, files_per_bucket)),
            )
        finally:
            rows.unpersist()

    def _ensure_stats_col(self, col: str) -> None:
        """Persist ``col`` into the ``stats_cols`` table property (no-op
        commit when already harvested) so zone maps exist for it on this
        and every future write."""
        def mutate(s):
            props = s.setdefault("properties", {})
            listed = list(props.get("stats_cols", []) or [])
            implicit = {LAST_LSN_COL, DELETED_COL, "ts",
                        (s.get("sort_cols") or [None])[0]}
            if col in listed or col in implicit:
                return None  # already harvested — nothing to commit
            props["stats_cols"] = listed + [col]
            return s

        self.commit(mutate)

    def rebucket(self, new_num_buckets: int) -> dict:
        """Grow the bucket count in one snapshot-atomic rewrite — the first
        maintenance operation a table seeded small needs at 100× growth.

        ``pmod(xxhash64(k), M)`` with ``old_N | M`` REFINES the old
        bucketing: every row of old bucket b lands in one of its children
        ``{b, b+old_N, …, b+(f−1)·old_N}`` (f = M/old_N), never in another
        parent's child. The split is bucket-local, so the rewrite runs with
        NO shuffle: each task fans the parent rows it read into their child
        directories via ``partitionBy`` — one read+write pass of the table,
        zero exchanges (pinned by ``test_rebucket_plan_no_shuffle``). At
        100 TB the pass parallelizes per-file and writes stay node-local.

        Power-of-two factor required (any multiple satisfies the
        congruence; 2^k keeps successive splits composable). MOR deltas are
        folded (scan resolves them) and tombstones carried. The commit is
        conflict-detected against ANY concurrent commit — the state the
        rewrite read must still be current, else ``CommitConflict`` (retry
        the whole operation). Fences, schema history and properties carry
        forward: a resuming stream keeps its exactly-once guarantees over
        the new layout, and CDF across the transition reports no spurious
        changes (row versions are untouched)."""
        snap = self.snapshot()
        old_n = int(snap["num_buckets"])
        factor = new_num_buckets // old_n if old_n else 0
        if (
            new_num_buckets <= old_n
            or old_n * factor != new_num_buckets
            or factor & (factor - 1)
        ):
            raise ValueError(
                f"rebucket target {new_num_buckets} must be old bucket count "
                f"({old_n}) × a power of two"
            )
        rows = self.scan(snap=snap, include_deleted=True).withColumn(
            BUCKET_COL, bucket_expr(snap["bucket_key"], new_num_buckets)
        )
        new_files = self._write_data(rows, shuffle=False)

        def mutate(s):
            if s["version"] != snap["version"]:
                raise CommitConflict(
                    f"table changed during rebucket (snapshot "
                    f"{snap['version']} → {s['version']}); retry rebucket"
                )
            sid = s["current_schema_id"]
            s["num_buckets"] = int(new_num_buckets)
            s["files"] = {
                b: [{**e, "schema_id": sid} for e in entries]
                for b, entries in new_files.items()
            }
            s["lineage"] = []
            return s

        return self.commit(mutate)

    def vacuum_tombstones(self, below_lsn: int) -> dict | None:
        """Drop tombstones with _last_lsn < below_lsn (older than the
        source's max reorder horizon — late events below this LSN can no
        longer arrive, so the fence rows are dead weight).

        Zone-map pruned: a bucket is rewritten only if at least one of its
        files MAY hold a qualifying tombstone (file stats show
        max(_deleted) = true AND min(_last_lsn) < below_lsn). Buckets whose
        every file provably has no qualifying tombstone carry forward
        untouched — maintenance cost ∝ qualifying-bucket bytes, not table
        bytes. Files without stats are conservatively rewritten."""
        snap = self.snapshot()
        if "_deleted" not in {f.name for f in self.schema.fields}:
            return None

        def may_qualify(entry: dict) -> bool:
            stats = entry.get("stats") or {}
            d, l = stats.get(DELETED_COL), stats.get(LAST_LSN_COL)
            has_tombstone = d is None or bool(d["max"])
            old_enough = l is None or l["min"] < below_lsn
            return has_tombstone and old_enough

        buckets = sorted(
            int(b)
            for b, entries in snap["files"].items()
            if any(may_qualify(e) for e in entries)
        )
        if not buckets:
            return None
        rows = self.scan(buckets, snap, include_deleted=True)
        kept = rows.filter(
            ~(
                F.coalesce(F.col("_deleted"), F.lit(False))
                & (F.col("_last_lsn") < F.lit(below_lsn))
            )
        ).withColumn(BUCKET_COL, bucket_expr(snap["bucket_key"], snap["num_buckets"]))
        return self.replace_buckets(kept, buckets, base_snapshot=snap)

    def vacuum_files(self, keep_snapshots: int = 2) -> list[str]:
        """Delete data files referenced by NO retained snapshot and drop
        metadata older than the last ``keep_snapshots`` versions. TAGGED
        versions (see ``tag``) are always retained — metadata, manifests and
        data files — so a pinned training dataset survives any vacuum. Safe
        order: metadata first (readers can no longer reach old versions),
        then unreferenced files. Returns deleted file paths."""
        versions = sorted(
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self._meta_dir, "v*.json"))
        )
        tagged = {
            int(v) for v in (self.snapshot().get("tags") or {}).values()
        }
        retained = sorted(set(versions[-keep_snapshots:]) | (tagged & set(versions)))
        live: set[str] = set()
        live_manifests: set[str] = set()
        for v in retained:
            s = self.snapshot_at(v)
            live_manifests |= set((s.get("manifests") or {}).values())
            for entries in s["files"].values():
                for e in entries:
                    live.add(os.path.join(self.path, e["path"]))
        for v in versions:
            if v not in retained:
                os.remove(os.path.join(self._meta_dir, f"v{v:08d}.json"))
        # manifests referenced by no retained root follow their snapshots out
        for p in glob.glob(os.path.join(self._meta_dir, "manifests", "m-*.json")):
            rel = os.path.relpath(p, self._meta_dir)
            if rel not in live_manifests:
                os.remove(p)
                self._manifest_cache.pop(rel, None)
        deleted = []
        for p in glob.glob(os.path.join(self._data_dir, "commit-*", "**", "*.parquet"),
                           recursive=True):
            if p not in live:
                os.remove(p)
                deleted.append(p)
        return deleted

    def lineage_df(self) -> DataFrame:
        """All lineage rows across all snapshots, as a DataFrame."""
        from battetl_spark.schemas import LINEAGE_SCHEMA

        rows = []
        for p in sorted(glob.glob(os.path.join(self._meta_dir, "v*.json"))):
            with open(p) as f:
                snap = json.load(f)
            for r in snap.get("lineage", []):
                r = dict(r)
                r["snapshot_id"] = snap["snapshot_id"]
                r["committed_at"] = datetime.fromisoformat(r["committed_at"])
                r.setdefault("rebases", 0)  # rows from pre-rebase-metric snaps
                rows.append(r)
        if not rows:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.createDataFrame(rows, LINEAGE_SCHEMA)


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
