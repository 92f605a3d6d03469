"""Warehouse maintenance CLI — the Iceberg-procedures analogue
(rewrite_data_files / expire_snapshots) plus rollup refresh, run as a
scheduled job beside the ingest:

    python swarm_spark/maintain.py --warehouse /path/wh \
        --compact-above-files 64 --expire-keep 5 --refresh-daily-rollup

Small-file compaction matters at 100 TB: every streaming epoch / batch
append adds a data dir, and scan planning degrades as file counts grow.
Policy here is count-triggered: a table is rewritten only when its live
file count exceeds the threshold (compaction is a full rewrite of
CURRENT — cheap for agg/audit tables, scheduled off-peak for fact
tables). Expiry then drops snapshot metadata past --expire-keep and
vacuums unreferenced dirs. Both are per-table atomic snapshot commits;
a concurrent append aborts the rewrite, never the other way around.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):  # direct script / spark-submit invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def live_file_count(table) -> int:
    """Parquet files referenced by CURRENT (not historical dirs)."""
    snap = table.current_snapshot()
    if snap is None:
        return 0
    n = 0
    for d in snap["data_dirs"]:
        for root, _dirs, files in os.walk(d):
            n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def erase_batch(spark, warehouse: str, batch_id: str,
                tables: list[str] | None = None,
                mode: str = "cow") -> dict:
    """Excise one ingest batch from every sink (bad-batch rollback
    AFTER later batches have landed, when expire/rollback would lose
    them): delete_where(ingest_id = batch). Because each append lands
    in its own `_s=` dir whose stats sidecar pins ingest_id min=max,
    dir-level pruning rewrites EXACTLY the dirs that batch wrote and
    carries every other batch's dirs untouched — erasure cost is
    O(batch), not O(table). Tables without an ingest_id column (aggs,
    audit) are skipped and reported."""
    from swarm_spark.tablestore import IcepackCatalog

    cat = IcepackCatalog(warehouse)
    report: dict = {}
    for name in tables or cat.tables():
        t = cat.table(name)
        snap = t.current_snapshot() if t.exists() else None
        if snap is None:
            continue
        import json as _json

        from pyspark.sql import types as T
        schema = T.StructType.fromJson(_json.loads(snap["schema"]))
        if "ingest_id" not in {f.name for f in schema.fields}:
            report[name] = {"skipped": "no ingest_id column"}
            continue
        s = t.delete_where(spark, [("ingest_id", "=", batch_id)], mode=mode)
        if mode == "mor":
            report[name] = {"mode": "mor",
                            "dirs_affected": s.get("dirs_affected", 0)}
        else:
            report[name] = {k: s[k] for k in
                            ("rows_deleted", "dirs_rewritten", "dirs_untouched")}
    return report


def maintain(spark, warehouse: str, tables: list[str] | None = None,
             compact_above_files: int = 0, target_files: int | None = None,
             expire_keep: int = 0, refresh_daily_rollup: bool = False,
             cluster_by: list[str] | None = None,
             gc_orphans_older_than: float | None = None,
             erase_batch_id: str | None = None,
             erase_mode: str = "cow",
             fold_deletes_above: int | None = None,
             create_tag: str | None = None,
             bloom_cols: list[str] | None = None) -> dict:
    from pyspark.sql import functions as F

    from swarm_spark.incremental import refresh_agg
    from swarm_spark.tablestore import CommitConflict, IcepackCatalog

    cat = IcepackCatalog(warehouse)
    names = tables or cat.tables()
    report: dict = {"tables": {}}
    if erase_batch_id:
        report["erased"] = erase_batch(spark, warehouse, erase_batch_id, names,
                                       mode=erase_mode)
    for name in names:
        t = cat.table(name)
        if not t.exists():
            continue
        entry: dict = {"files_before": live_file_count(t)}
        if compact_above_files and entry["files_before"] > compact_above_files:
            try:
                fields = {f.name for f in t.schema().fields}
                cb = [c for c in (cluster_by or []) if c in fields]
                bc = [c for c in (bloom_cols or []) if c in fields]
                t.compact(spark, target_files=target_files,
                          cluster_by=cb or None, bloom_cols=bc or None)
                entry["compacted"] = True
                entry["files_after"] = live_file_count(t)
            except CommitConflict:
                entry["compacted"] = False  # writer won; retry next run
        if fold_deletes_above is not None:
            snap = t.current_snapshot()
            n_pending = len((snap.get("deletes") or [])) if snap else 0
            if n_pending > fold_deletes_above:
                try:
                    t.compact(spark, target_files=target_files)
                    entry["deletes_folded"] = n_pending
                except CommitConflict:
                    entry["deletes_folded"] = 0  # writer won; next run
        if expire_keep:
            entry["expired"] = t.expire_snapshots(keep_last=expire_keep)
        if gc_orphans_older_than is not None:
            entry["orphans"] = t.remove_orphan_files(
                older_than_sec=gc_orphans_older_than)
        if bloom_cols:
            # point-read acceleration: per-file equality blooms for
            # whichever of the requested key columns this table has
            bc = [c for c in bloom_cols
                  if c in {f.name for f in t.schema().fields}]
            if bc:
                entry["blooms"] = t.build_blooms(spark, bc)
        if create_tag:
            # release automation: pin CURRENT (post-maintenance) under
            # the given name — expire never drops it (tablestore tags)
            entry["tagged"] = {create_tag: t.create_tag(create_tag)}
        report["tables"][name] = entry
    if refresh_daily_rollup and cat.table("_agg_hourly").exists():
        report["daily_rollup"] = refresh_agg(
            spark, cat.table("_agg_hourly"), cat.table("_agg_daily"),
            keys=["sink", "role", "tool", "day"], sums={"turns": "n"},
            prepare=lambda df: df.withColumn("day", F.date_trunc("day", "hour")),
        )
    return report


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="swarm-spark-maintain", description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--tables", nargs="*", default=None,
                    help="default: every table in the warehouse")
    ap.add_argument("--compact-above-files", type=int, default=0,
                    help="rewrite a table whose live parquet file count exceeds N")
    ap.add_argument("--target-files", type=int, default=None,
                    help="coalesce the rewrite to at most N files")
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="expire snapshots older than the newest K; vacuum dirs")
    ap.add_argument("--refresh-daily-rollup", action="store_true")
    ap.add_argument("--gc-orphans-older-than", type=float, default=None,
                    help="remove unreferenced _s= data dirs older than this "
                         "many seconds (crashed-writer leftovers)")
    ap.add_argument("--erase-batch", default=None, metavar="BATCH_ID",
                    help="excise one ingest batch (delete_where ingest_id=) "
                         "from every table that has the envelope column; "
                         "dir pruning rewrites only that batch's dirs")
    ap.add_argument("--tag", default=None, metavar="NAME",
                    help="pin each processed table's CURRENT snapshot under "
                         "this tag (expire-protected dataset release)")
    ap.add_argument("--erase-mode", choices=("cow", "mor"), default="cow",
                    help="cow: rewrite the batch's dirs now; mor: record a "
                         "merge-on-read mask (O(metadata)), folded at the "
                         "next compaction")
    ap.add_argument("--fold-deletes-above", type=int, default=None,
                    help="compact any table carrying more than N pending "
                         "merge-on-read delete entries (folds masks into data)")
    ap.add_argument("--bloom-cols", nargs="*", default=None,
                    help="build per-file equality bloom filters for these "
                         "columns on every table that has them (point-read "
                         "file skipping on unclustered keys)")
    ap.add_argument("--cluster-by", nargs="*", default=None,
                    help="sort-cluster compaction rewrites on these columns "
                         "(columns absent from a table are skipped for it) — "
                         "tightens per-file bounds so read(prune=...) skips files")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from swarm_spark.session import get_spark

    spark = get_spark("swarm_spark_maintain", cpus=args.cpus)
    report = maintain(
        spark, args.warehouse, tables=args.tables,
        compact_above_files=args.compact_above_files,
        target_files=args.target_files,
        expire_keep=args.expire_keep,
        refresh_daily_rollup=args.refresh_daily_rollup,
        cluster_by=args.cluster_by,
        gc_orphans_older_than=args.gc_orphans_older_than,
        erase_batch_id=args.erase_batch,
        erase_mode=args.erase_mode,
        fold_deletes_above=args.fold_deletes_above,
        create_tag=args.tag,
        bloom_cols=args.bloom_cols,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
