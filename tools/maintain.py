"""spark-submit maintenance entry point for a LakeTable.

The four operations a long-lived CDC table needs, each snapshot-atomic and
safe beside a running stream (conflict-detected where they rewrite data):

  compact           fold crowded buckets (and MOR deltas) into one file each
                    (--cluster-by col: range-clustered files so zone maps skip)
  vacuum-tombstones drop delete fences older than the reorder horizon
  vacuum-files      GC data files + manifests unreachable from retained
                    snapshots; prune old snapshot roots
  compact-fences    fold the contiguous fenced-epoch prefix into the floor
  rebucket          power-of-two bucket-count growth (shuffle-free rewrite)
  expire-history    SCD-2 retention: drop versions closed at/below an LSN
                    (HistoryTable; bucket-pruned via valid_to zone maps)
  tag               pin a named, vacuum-protected tag to the current (or
                    a given) snapshot version; delete-tag removes the pin
  drop-column       metadata-only column drop (re-add = new masked column)
  rename-column     metadata-only rename (old files read through an alias)

plus one for the file-backed change log (``--log`` instead of ``--table``):

  vacuum-segments   delete log segments fully consumed by every given
                    --checkpoint (resume-safe; Kafka-retention analog)

Cluster usage:

  spark-submit --py-files engine.zip tools/maintain.py \
      --table s3://.../transcripts compact --min-files 8

Local smoke:

  python tools/maintain.py --table /tmp/t compact-fences
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table")
    ap.add_argument("--log", help="FilePartitionedLog path (vacuum-segments)")
    sub = ap.add_subparsers(dest="op", required=True)
    p = sub.add_parser("compact")
    p.add_argument("--min-files", type=int, default=4)
    p.add_argument("--cluster-by", help="rewrite buckets range-clustered on "
                   "this column (files hold disjoint ranges; zone maps "
                   "skip); a comma-separated list Z-ORDERS instead — files "
                   "range-tight in every listed dimension")
    p.add_argument("--files-per-bucket", type=int, default=1)
    p = sub.add_parser("vacuum-tombstones")
    p.add_argument("--below-lsn", type=int, required=True)
    p = sub.add_parser("vacuum-files")
    p.add_argument("--keep-snapshots", type=int, default=2)
    sub.add_parser("compact-fences")
    p = sub.add_parser("expire-history")
    p.add_argument("--before-lsn", type=int, required=True)
    p = sub.add_parser("rebucket")
    p.add_argument("--num-buckets", type=int, required=True)
    p = sub.add_parser("tag")
    p.add_argument("--name", required=True)
    p.add_argument("--version", type=int, help="default: current version")
    p.add_argument("--replace", action="store_true")
    p = sub.add_parser("delete-tag")
    p.add_argument("--name", required=True)
    p = sub.add_parser("drop-column")
    p.add_argument("--name", required=True)
    p = sub.add_parser("rename-column")
    p.add_argument("--old", required=True)
    p.add_argument("--new", required=True)
    p = sub.add_parser("vacuum-segments")
    p.add_argument("--checkpoint", action="append", required=True,
                   help="consumer checkpoint dir (repeatable; a segment is "
                        "deleted only when EVERY checkpoint consumed it)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("battetl_spark-maintain").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.op == "vacuum-segments":
        from battetl_spark.streaming import FilePartitionedLog

        if not args.log:
            ap.error("vacuum-segments requires --log")
        log = FilePartitionedLog.open(spark, args.log)
        deleted = log.vacuum_segments(args.checkpoint)
        print(f"vacuum-segments: {len(deleted)} segments reclaimed")
        return

    from battetl_spark.lake import LakeTable

    if not args.table:
        ap.error(f"{args.op} requires --table")
    table = LakeTable.load(spark, args.table)

    def ver(snap):
        return "no-op" if snap is None else "v" + str(snap["version"])

    if args.op == "compact":
        print("compact: " + ver(table.compact(
            min_files_per_bucket=args.min_files,
            cluster_by=(args.cluster_by.split(",")
                        if args.cluster_by and "," in args.cluster_by
                        else args.cluster_by),
            files_per_bucket=args.files_per_bucket,
        )))
    elif args.op == "vacuum-tombstones":
        print("vacuum-tombstones: "
              + ver(table.vacuum_tombstones(below_lsn=args.below_lsn)))
    elif args.op == "vacuum-files":
        deleted = table.vacuum_files(keep_snapshots=args.keep_snapshots)
        print(f"vacuum-files: {len(deleted)} files reclaimed")
    elif args.op == "compact-fences":
        snap = table.compact_fences()
        floor = table.fence_floor()
        print(f"compact-fences: {'no-op' if snap is None else 'folded'} "
              f"(floor={floor}, map={len(table.fences())})")
    elif args.op == "expire-history":
        from battetl_spark.cdc import HistoryTable

        print("expire-history: "
              + ver(HistoryTable(table).expire_versions(args.before_lsn)))
    elif args.op == "rebucket":
        snap = table.rebucket(args.num_buckets)
        print(f"rebucket: v{snap['version']} num_buckets={snap['num_buckets']}")
    elif args.op == "tag":
        v = table.tag(args.name, version=args.version, replace=args.replace)
        print(f"tag: {args.name} -> v{v}")
    elif args.op == "delete-tag":
        table.delete_tag(args.name)
        print(f"delete-tag: {args.name} removed")
    elif args.op == "drop-column":
        schema = table.drop_column(args.name)
        print(f"drop-column: {args.name} ({len(schema.fields)} columns remain)")
    elif args.op == "rename-column":
        table.rename_column(args.old, args.new)
        print(f"rename-column: {args.old} -> {args.new}")


if __name__ == "__main__":
    main()
