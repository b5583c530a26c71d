"""merge_apply — fenced, copy-on-write MERGE of a change-event batch.

The Spark/lakehouse re-expression of the reference's load path
(SURVEY.md §2.3 U1/U2/U5, reference battetl/load/Loader.py:144-332):

    MERGE INTO transcripts t USING winners s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED AND s.lsn > t._last_lsn AND s.op = 'd' THEN DELETE
      WHEN MATCHED AND s.lsn > t._last_lsn THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op != 'd' THEN INSERT *

implemented as a bucket-pruned copy-on-write plan:
  1. fence check (epoch already applied → whole batch is a no-op);
  2. schema-evolution gate (add/widen allowed, incompatible rejected,
     nothing committed on rejection);
  3. LSN dedup to one winner per key (battetl_spark.cdc.dedup — skew-safe);
  4. prune: only buckets containing winner keys are read & rewritten;
  5. union current rows (as pseudo-events at lsn=_last_lsn) with winners and
     take max-lsn per key → late events (lsn <= _last_lsn) are no-ops;
  6. atomic snapshot commit carrying fence + per-partition lineage.

Scale: cost ∝ (batch size + touched-bucket bytes). num_buckets is the knob —
at 100 TB with 4096 buckets a batch touching 1% of conversations reads/writes
~1 GB-scale bucket slices, never the table. All steps are Catalyst plans;
nothing iterates rows on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from battetl_spark.cdc.dedup import lww_winners
from battetl_spark.lake.table import BUCKET_COL, LakeTable, bucket_expr, utc_now_iso
from battetl_spark.schemas import DELETED_COL, KEY_COLS, LAST_LSN_COL

ENVELOPE_COLS = ("lsn", "op", "source_partition")


@dataclass
class MergeResult:
    applied: bool
    snapshot_id: int | None = None
    rows_inserted: int = 0
    rows_updated: int = 0
    rows_deleted: int = 0
    buckets_rewritten: list[int] = field(default_factory=list)
    lineage: list[dict] = field(default_factory=list)  # per-source-partition
    # CommitConflict rebases absorbed before this merge committed — operators
    # of a multi-writer deployment watch this for contention (also recorded
    # per lineage row, so the metrics feed carries it)
    rebases: int = 0


def _incoming_table_schema(events: DataFrame) -> T.StructType:
    """Row-image schema implied by an event batch = payload cols + _last_lsn."""
    fields = [f for f in events.schema.fields if f.name not in ENVELOPE_COLS]
    fields.append(T.StructField(LAST_LSN_COL, T.LongType(), False))
    return T.StructType(fields)


# ------------------------------------------------ shared CoW/MOR building blocks

def _project(df: DataFrame, payload_cols, by_name, snap) -> DataFrame:
    """Event batch → evolved payload casts + envelope + bucket id."""
    return df.select(
        *[
            F.col(c).cast(by_name[c].dataType).alias(c)
            if c in df.columns
            else F.lit(None).cast(by_name[c].dataType).alias(c)
            for c in payload_cols
        ],
        F.col("lsn"),
        F.col("op"),
        F.col("source_partition"),
    ).withColumn(BUCKET_COL, bucket_expr(snap["bucket_key"], snap["num_buckets"]))


def _affected_buckets(slim: DataFrame) -> tuple[list[int], int]:
    """(sorted bucket ids, batch max lsn) from a column-pruned (bucket, lsn)
    frame — ONE tiny map-side-combined aggregate job."""
    rows = slim.groupBy(BUCKET_COL).agg(F.max("lsn").alias("mx")).collect()
    return sorted(r[0] for r in rows), max((r["mx"] for r in rows), default=0)


def _partition_offsets(events: DataFrame) -> dict:
    """Per-source-partition (min_lsn, max_lsn) — the lineage offset frame."""
    return {
        r["source_partition"]: r
        for r in events.groupBy("source_partition")
        .agg(F.min("lsn").alias("min_lsn"), F.max("lsn").alias("max_lsn"))
        .collect()
    }


def _envelope_stats(slim: DataFrame) -> tuple[list[int], int, dict]:
    """``_affected_buckets`` + ``_partition_offsets`` from one
    (bucket, lsn, source_partition) envelope projection in ONE collect job
    (round 6: the fused-with-lineage path paid two driver-synchronous
    aggregate jobs over the same tiny frame — each a full job round-trip
    per merge batch). Both aggregates are map-side-combined; the union just
    shares the job. Values are identical to the separate calls."""
    rows = (
        slim.groupBy(BUCKET_COL)
        .agg(F.max("lsn").alias("max_lsn"))
        .select(
            F.lit(0).alias("__g"),
            F.col(BUCKET_COL).alias("__b"),
            F.lit(None).cast("int").alias("source_partition"),
            F.lit(None).cast("long").alias("min_lsn"),
            "max_lsn",
        )
        .unionByName(
            slim.groupBy("source_partition")
            .agg(F.min("lsn").alias("min_lsn"), F.max("lsn").alias("max_lsn"))
            .select(
                F.lit(1).alias("__g"),
                F.lit(None).cast(slim.schema[BUCKET_COL].dataType).alias("__b"),
                "source_partition",
                "min_lsn",
                "max_lsn",
            )
        )
        .collect()
    )
    buckets = sorted(r["__b"] for r in rows if r["__g"] == 0)
    mx = max((r["max_lsn"] for r in rows if r["__g"] == 0), default=0)
    offsets = {
        r["source_partition"]: r for r in rows if r["__g"] == 1
    }
    return buckets, mx, offsets


def merge_apply(
    table: LakeTable,
    events: DataFrame,
    epoch_id: int | None = None,
    key_cols: list[str] | None = None,
    dedup_strategy: str = "fused",
    salt_buckets: int = 32,
    collect_lineage: bool = True,
    target_partitions: int | None = None,
    conflict_retries: int = 2,
    mode: str = "cow",
) -> MergeResult:
    """Apply one batch of change events to the table, exactly once.

    ``mode``:
    - ``cow`` (default): copy-on-write — read the touched buckets, resolve
      LWW against current rows, rewrite those buckets. Write cost ∝ batch +
      touched-bucket bytes; reads stay resolve-free.
    - ``mor``: merge-on-read — dedup the batch to one winner per key and
      APPEND the winners as delta files, never reading existing data. Write
      cost ∝ batch bytes only (the ingest-side answer when hot buckets make
      CoW rewrite amplification dominate at 100 TB); scans of delta-bearing
      buckets pay a per-key LWW resolve until ``table.compact()`` folds
      deltas into base files. Same fences/exactly-once; late events still
      lose at read time via the same (lsn, base-wins-ties) order. Lineage
      in this mode counts batch winners (upserts as rows_inserted, deletes
      as rows_deleted, rows_updated = 0): classifying insert-vs-update
      exactly would require reading current rows — the very work MOR defers.

    A concurrent writer (another merge, a compaction) that lands on an
    overlapping bucket between our scan and our commit aborts the commit
    with CommitConflict; the merge then RE-RUNS against the fresh snapshot
    (up to ``conflict_retries`` times) — a rebase, never a blind re-apply,
    so no committed row is ever overwritten from stale data.

    ``epoch_id`` fences the commit: if this epoch is already in the table's
    fence map the batch is skipped entirely (idempotent replay). With
    epoch_id=None the merge still applies (ad-hoc batch mode) but has no
    replay protection.

    ``dedup_strategy``:
    - ``fused`` (default): batch dedup and table-resolution happen in ONE
      key-shuffled aggregation (the resolve max_by already picks the max-lsn
      event per key; a separate pre-dedup shuffle is redundant). Affected
      buckets come from a column-pruned (bucket, max lsn) aggregate over the
      raw events — a tiny map-side-combined shuffle, not a payload shuffle.
    - ``agg`` / ``salted`` / ``window``: pre-winnow with that
      battetl_spark.cdc.dedup strategy first (two shuffles; ``salted`` is
      the explicit two-phase skew path, equivalence-tested).
    """
    from battetl_spark.lake.table import CommitConflict

    if mode == "mor":
        # append-only commit: commutes with concurrent appends, the commit's
        # own optimistic retry suffices — no rebase loop needed
        return _merge_apply_mor(
            table, events, epoch_id, key_cols, dedup_strategy, salt_buckets,
            collect_lineage, target_partitions,
        )
    if mode != "cow":
        raise ValueError(f"unknown merge mode {mode!r} (cow | mor)")

    last: CommitConflict | None = None
    for attempt in range(conflict_retries + 1):
        try:
            return _merge_apply_once(
                table, events, epoch_id, key_cols, dedup_strategy,
                salt_buckets, collect_lineage, target_partitions,
                rebases=attempt,
            )
        except CommitConflict as e:
            last = e  # rebase: everything below re-derives from a fresh snapshot
    raise last


def _merge_apply_mor(
    table: LakeTable,
    events: DataFrame,
    epoch_id: int | None,
    key_cols: list[str] | None,
    dedup_strategy: str,
    salt_buckets: int,
    collect_lineage: bool,
    target_partitions: int | None,
) -> MergeResult:
    """Merge-on-read apply: batch-local LWW winners appended as delta files.

    ONE key shuffle over the batch (not the bucket) — the resolve against
    existing rows is deferred to scan()/compact(). Fence, schema gate,
    dedup strategies (``salted`` for hot-key batches) and lineage offsets
    behave exactly like the CoW path."""
    key_cols = key_cols or KEY_COLS
    if epoch_id is not None and table.has_fence(epoch_id):
        return MergeResult(applied=False)

    evolved = table.evolve_schema(_incoming_table_schema(events))
    snap = table.snapshot()
    payload_cols = [f.name for f in evolved.fields if not f.name.startswith("_")]
    by_name = {f.name: f for f in evolved.fields}

    offsets: dict | None = None
    if collect_lineage:
        # one job: affected buckets + fence max + lineage offsets together
        buckets, batch_max_lsn, offsets = _envelope_stats(
            events.select(
                bucket_expr(
                    snap["bucket_key"], snap["num_buckets"]
                ).alias(BUCKET_COL),
                "lsn",
                "source_partition",
            )
        )
    else:
        buckets, batch_max_lsn = _affected_buckets(
            events.select(
                bucket_expr(
                    snap["bucket_key"], snap["num_buckets"]
                ).alias(BUCKET_COL),
                "lsn",
            )
        )
    if not buckets:
        return MergeResult(applied=False)

    if dedup_strategy == "fused":
        # batch-local LWW: one winner per key (same max_by fold, batch-only)
        projected = _project(events, payload_cols, by_name, snap)
        non_key = [c for c in projected.columns if c not in key_cols]
        winners = (
            projected.groupBy(*key_cols)
            .agg(F.max_by(F.struct(*non_key), F.col("lsn")).alias("__w"))
            .select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in non_key])
        )
    else:
        # explicit strategy (agg / salted / window) — same pre-winnow the
        # CoW path honors; never silently discard a requested skew path
        winners = _project(
            lww_winners(events, key_cols, "lsn", strategy=dedup_strategy,
                        salt_buckets=salt_buckets),
            payload_cols, by_name, snap,
        )

    lineage_rows: list[dict] = []
    ins = dele = 0
    if collect_lineage:
        winners = winners.persist()
        changes = {
            (r["source_partition"], r["__kind"]): r["n"]
            for r in winners.withColumn(
                "__kind", F.when(F.col("op") == "d", "delete").otherwise("upsert")
            )
            .groupBy("source_partition", "__kind")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        now = utc_now_iso()
        for sp, off in sorted(offsets.items(), key=lambda kv: (kv[0] is None, kv[0])):
            lineage_rows.append(
                {
                    "epoch_id": -1 if epoch_id is None else int(epoch_id),
                    "source_partition": sp,
                    "min_lsn": off["min_lsn"],
                    "max_lsn": off["max_lsn"],
                    "rows_inserted": changes.get((sp, "upsert"), 0),
                    "rows_updated": 0,  # insert/update split needs a read — deferred
                    "rows_deleted": changes.get((sp, "delete"), 0),
                    "rebases": 0,
                    "committed_at": now,
                }
            )
        ins = sum(r["rows_inserted"] for r in lineage_rows)
        dele = sum(r["rows_deleted"] for r in lineage_rows)

    dead = F.col("op") == "d"
    out = winners.select(
        *[
            F.col(c)
            if c in key_cols
            else F.when(dead, F.lit(None).cast(by_name[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
        F.col("lsn").alias(LAST_LSN_COL),
        dead.alias(DELETED_COL),
        F.col(BUCKET_COL),
    )
    fence = None
    if epoch_id is not None:
        fence = {"epoch_id": int(epoch_id), "max_lsn": int(batch_max_lsn)}
    try:
        new_snap = table.append_delta_buckets(
            out,
            fence=fence,
            lineage=lineage_rows,
            target_partitions=target_partitions,
            schema_id=snap["current_schema_id"],
        )
    finally:
        if collect_lineage:
            winners.unpersist()
    if new_snap is None:
        return MergeResult(applied=False)  # fence race: batch discarded
    return MergeResult(
        applied=True,
        snapshot_id=new_snap["snapshot_id"],
        rows_inserted=ins,
        rows_deleted=dele,
        buckets_rewritten=buckets,
        lineage=[
            {**r, "snapshot_id": new_snap["snapshot_id"]} for r in lineage_rows
        ],
    )


def _merge_apply_once(
    table: LakeTable,
    events: DataFrame,
    epoch_id: int | None,
    key_cols: list[str] | None,
    dedup_strategy: str,
    salt_buckets: int,
    collect_lineage: bool,
    target_partitions: int | None,
    rebases: int = 0,
) -> MergeResult:
    key_cols = key_cols or KEY_COLS
    if epoch_id is not None and table.has_fence(epoch_id):
        return MergeResult(applied=False)

    # -- schema-evolution gate (atomic; raises cleanly on incompatibility) --
    evolved = table.evolve_schema(_incoming_table_schema(events))
    snap = table.snapshot()
    payload_cols = [f.name for f in evolved.fields if not f.name.startswith("_")]
    by_name = {f.name: f for f in evolved.fields}

    persisted = None
    offsets = None
    if dedup_strategy == "fused":
        winners = _project(events, payload_cols, by_name, snap)
        # affected buckets + fence max from a column-pruned scan of the raw
        # batch (only bucket_key + lsn reach the shuffle, post-combine);
        # with lineage on, the per-partition offsets share the same job
        if collect_lineage:
            buckets, batch_max_lsn, offsets = _envelope_stats(
                events.select(
                    bucket_expr(
                        snap["bucket_key"], snap["num_buckets"]
                    ).alias(BUCKET_COL),
                    "lsn",
                    "source_partition",
                )
            )
        else:
            buckets, batch_max_lsn = _affected_buckets(
                events.select(
                    bucket_expr(
                        snap["bucket_key"], snap["num_buckets"]
                    ).alias(BUCKET_COL),
                    "lsn",
                )
            )
    else:
        winners = _project(
            lww_winners(events, key_cols, "lsn", strategy=dedup_strategy,
                        salt_buckets=salt_buckets),
            payload_cols, by_name, snap,
        ).persist()
        persisted = winners
    try:
        if dedup_strategy != "fused":
            buckets, batch_max_lsn = _affected_buckets(
                winners.select(BUCKET_COL, "lsn")
            )
        if not buckets:
            return MergeResult(applied=False)

        # current rows compete at lsn = _last_lsn; tombstones compete too
        # (op 'cd') so late updates lose to an already-applied delete.
        current = table.scan(buckets, snap, include_deleted=True).select(
            *payload_cols,
            F.col(LAST_LSN_COL).alias("lsn"),
            F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("cd"))
            .otherwise(F.lit("c"))
            .alias("op"),
            F.lit(None).cast("int").alias("source_partition"),
            bucket_expr(snap["bucket_key"], snap["num_buckets"]).alias(BUCKET_COL),
        )

        # -- cross-batch LWW: one winner per key among {current row, events} --
        combined = current.unionByName(winners)
        non_key = [c for c in combined.columns if c not in key_cols]
        # lsn ties (an event replayed at exactly the applied _last_lsn) must
        # resolve to the current row — a no-op, not a counted update.
        order = F.struct(
            F.col("lsn"), F.col("op").isin("c", "cd").cast("int").alias("__prio")
        )
        resolved = (
            combined.groupBy(*key_cols)
            .agg(
                F.max_by(F.struct(*non_key), order).alias("__w"),
                F.max(F.when(F.col("op") == "c", F.col("lsn"))).alias("__cur_lsn"),
            )
            .select(
                *key_cols,
                *[F.col(f"__w.{c}").alias(c) for c in non_key],
                F.col("__cur_lsn"),
            )
        )
        had_live = F.col("__cur_lsn").isNotNull()
        resolved = resolved.withColumn(
            "__change",
            F.when(F.col("op").isin("c", "cd"), F.lit("unchanged"))
            .when(F.col("op") == "d", F.when(had_live, "deleted").otherwise("unchanged"))
            .when(had_live, F.lit("updated"))
            .otherwise(F.lit("inserted")),
        )
        if collect_lineage:
            resolved = resolved.persist()  # reused by counts + write

        lineage_rows: list[dict] = []
        ins = upd = dele = 0
        if collect_lineage:
            if offsets is None:  # non-fused strategies: winners-side slim
                offsets = _partition_offsets(events)
            changes = {
                (r["source_partition"], r["__change"]): r["n"]
                for r in resolved.filter(F.col("__change") != "unchanged")
                .groupBy("source_partition", "__change")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            now = utc_now_iso()
            for sp, off in sorted(
                offsets.items(), key=lambda kv: (kv[0] is None, kv[0])
            ):
                lineage_rows.append(
                    {
                        "epoch_id": -1 if epoch_id is None else int(epoch_id),
                        "source_partition": sp,
                        "min_lsn": off["min_lsn"],
                        "max_lsn": off["max_lsn"],
                        "rows_inserted": changes.get((sp, "inserted"), 0),
                        "rows_updated": changes.get((sp, "updated"), 0),
                        "rows_deleted": changes.get((sp, "deleted"), 0),
                        "rebases": rebases,
                        "committed_at": now,
                    }
                )
            ins = sum(r["rows_inserted"] for r in lineage_rows)
            upd = sum(r["rows_updated"] for r in lineage_rows)
            dele = sum(r["rows_deleted"] for r in lineage_rows)

        # deletes are written as tombstones (payload nulled, _deleted=true)
        # so the delete's lsn keeps fencing later-arriving older updates.
        dead = F.col("op").isin("d", "cd")
        out = resolved.select(
            *[
                F.col(c)
                if c in key_cols
                else F.when(dead, F.lit(None).cast(by_name[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload_cols
            ],
            F.col("lsn").alias(LAST_LSN_COL),
            dead.alias(DELETED_COL),
            F.col(BUCKET_COL),
        )

        fence = None
        if epoch_id is not None:
            fence = {"epoch_id": int(epoch_id), "max_lsn": int(batch_max_lsn)}

        new_snap = table.replace_buckets(
            out,
            buckets,
            fence=fence,
            lineage=lineage_rows,
            target_partitions=target_partitions,
            base_snapshot=snap,  # conflict-detect: abort if a concurrent
            # writer changed any of these buckets since we scanned them
        )
        if new_snap is None:
            # fence appeared between the top-of-function check and the commit
            # (a replayed epoch raced us): the batch was discarded — report
            # honestly; the just-written orphan files are reclaimed by
            # vacuum_files.
            return MergeResult(applied=False)
        return MergeResult(
            applied=True,
            snapshot_id=new_snap["snapshot_id"],
            rows_inserted=ins,
            rows_updated=upd,
            rows_deleted=dele,
            buckets_rewritten=buckets,
            lineage=[
                {**r, "snapshot_id": new_snap["snapshot_id"]} for r in lineage_rows
            ],
            rebases=rebases,
        )
    finally:
        if persisted is not None:
            persisted.unpersist()
        if collect_lineage:
            try:
                resolved.unpersist()
            except NameError:
                pass


def delete_where(
    table: LakeTable,
    filters: list[tuple] | None = None,
    predicate=None,
    lsn: int | None = None,
    epoch_id: int | None = None,
    key_cols: list[str] | None = None,
    **merge_kwargs,
) -> MergeResult:
    """Bulk predicate DELETE as first-class CDC: synthesize tombstone
    change events for every live row matching the predicate and route them
    through ``merge_apply``, so every invariant — LWW resolve, tombstone
    fencing of late events, epoch fences, conflict rebase, lineage —
    applies unchanged (reference analog: the hard-delete retention path a
    warehouse runs around `/root/reference/battetl/load/Loader.py`'s
    insert-only tables; no native analog, engine surface).

    ``filters`` is ``scan()``'s ``(col, op, value)`` list and reaches the
    zone maps: on a 100-TB table a ``ts``-bounded purge opens only the
    files whose range overlaps, and the synthesized events carry ONLY key
    and envelope columns with live values (payload columns are typed
    NULLs), so column pruning reaches the parquet scan too. ``predicate``
    adds an arbitrary post-scan row filter (Column) when the condition
    isn't zone-map expressible.

    ``lsn``:
    - ``None`` (default): each event deletes at ``row._last_lsn + 1`` — a
      *snapshot-conditional* delete that wins exactly over the version it
      observed and loses to any concurrently-committed newer update (that
      row survives; CDC-correct, no lost update).
    - an int: a fixed stream-aligned LSN for every event; rows whose
      ``_last_lsn >= lsn`` are NOT deleted (LWW keeps them) — the caller
      owns the ordering guarantee.

    Deletes-as-of-snapshot: rows committed by writers AFTER our scan
    pinned its file list are not candidates even if they match. The
    returned ``MergeResult.rows_deleted`` counts rows actually deleted.
    """
    key_cols = key_cols or KEY_COLS
    snap = table.snapshot()
    schema = T.StructType.fromJson(snap["schema"])
    rows = table.scan(filters=filters, snap=snap)
    if predicate is not None:
        rows = rows.filter(predicate)
    lsn_col = (
        (F.col(LAST_LSN_COL) + F.lit(1)).cast("long")
        if lsn is None
        else F.lit(int(lsn)).cast("long")
    )
    events = rows.select(
        lsn_col.alias("lsn"),
        F.lit("d").alias("op"),
        *[
            F.col(f.name).alias(f.name)
            if f.name in key_cols
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if not f.name.startswith("_")
        ],
        F.lit(None).cast("int").alias("source_partition"),
    )
    return merge_apply(
        table, events, epoch_id=epoch_id, key_cols=key_cols, **merge_kwargs
    )
