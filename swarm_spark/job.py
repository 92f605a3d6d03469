"""spark-submit entry point — the rebuild of `swarm ingest`
(/root/reference/pkg/controller/cmd/ingest.go:16-94).

    spark-submit --py-files swarm_spark.zip swarm_spark/job.py \
        --input /path/to/transcripts(.parquet|icepack table dir) \
        --warehouse /path/to/warehouse --batch-id batch-001

On a cluster, ship the package with tools/build_pyfiles.py's zip. The
job is exactly-once per --batch-id (manifest gate): re-submitting a
completed batch is a no-op, mirroring the Firestore completed-state
skip (pkg/controller/server/server.go:126-144).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):  # direct script / spark-submit invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_expectation(spec: str) -> tuple:
    """One --expect RULE string → an operators/expectations rule tuple.
    Fail-fast with guidance: a typo'd gate must not silently vanish."""
    parts = spec.split(":")
    kind = parts[0]
    try:
        if kind == "not_null" and len(parts) == 2:
            return ("not_null", parts[1])
        if kind == "unique" and len(parts) == 2:
            return ("unique", parts[1].split(","))
        if kind == "accepted_values" and len(parts) == 3:
            return ("accepted_values", parts[1], parts[2].split(","))
        if kind == "range" and len(parts) == 4:
            lo = None if parts[2] == "" else float(parts[2])
            hi = None if parts[3] == "" else float(parts[3])
            return ("range", parts[1], lo, hi)
        if kind == "matches" and len(parts) >= 3:
            return ("matches", parts[1], ":".join(parts[2:]))
    except ValueError as e:
        raise SystemExit(f"--expect {spec!r}: {e}")
    raise SystemExit(
        f"--expect {spec!r}: unknown form — see --help for the grammar")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="swarm-spark-ingest", description=__doc__)
    ap.add_argument("--input", required=True,
                    help="transcripts parquet path, or events parquet dir via --derive")
    ap.add_argument("--warehouse", required=True, help="icepack warehouse root")
    ap.add_argument("--batch-id", required=True, help="exactly-once batch key")
    ap.add_argument("--derive-from-events", action="store_true",
                    help="treat --input as an sf dir holding events.parquet")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--on-unmatched", default="skip", choices=["skip", "error", "keep"])
    ap.add_argument("--assume-ordered", action="store_true",
                    help="skip the turn-ordering window (input guarantees order)")
    ap.add_argument("--dry-run", action="store_true",
                    help="plan + explain only; write nothing (≙ swarm --dry-run)")
    ap.add_argument("--expect", action="append", default=None,
                    metavar="RULE", help="data-quality gate on the staged "
                    "batch before ANY sink commits (write-audit-publish). "
                    "Forms: not_null:COL | unique:COL[,COL..] | "
                    "accepted_values:COL:v1,v2 | range:COL:LO:HI | "
                    "matches:COL:REGEX. Repeatable; applies to every sink.")
    ap.add_argument("--refresh-daily-rollup", action="store_true",
                    help="after the ingest, bring the _agg_daily rollup table "
                         "up to date from _agg_hourly INCREMENTALLY (scans only "
                         "snapshots appended since the last refresh; idempotent)")
    args = ap.parse_args(argv)

    from swarm_spark.datagen import transcripts_from_events
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules,
        default_schema_rules,
        default_tool_dim,
    )
    from swarm_spark.session import get_spark

    spark = get_spark("swarm_spark_ingest", cpus=args.cpus)
    if args.derive_from_events:
        transcripts = transcripts_from_events(spark, args.input)
    else:
        transcripts = spark.read.parquet(args.input)

    cfg = PipelineConfig(
        event_rules=default_event_rules(),
        schema_rules=default_schema_rules(),
        warehouse=args.warehouse,
        tool_dim=default_tool_dim(spark),
        on_unmatched=args.on_unmatched,
        assume_ordered=args.assume_ordered,
        sink_expectations=(
            {"*": [parse_expectation(r) for r in args.expect]}
            if args.expect else None),
    )
    pipe = IngestPipeline(spark, cfg)

    if args.dry_run:
        routed = pipe.routed(transcripts, ingest_id="dry-run")
        routed.explain("formatted")
        print(json.dumps({"dry_run": True, "sinks": sorted({r.sink_table for r in cfg.schema_rules})}))
        return 0

    res = pipe.run(transcripts, batch_id=args.batch_id)
    rollup = None
    if args.refresh_daily_rollup:
        from pyspark.sql import functions as F

        from swarm_spark.incremental import refresh_agg
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(args.warehouse)
        rollup = refresh_agg(
            spark, cat.table("_agg_hourly"), cat.table("_agg_daily"),
            keys=["sink", "role", "tool", "day"], sums={"turns": "n"},
            prepare=lambda df: df.withColumn("day", F.date_trunc("day", "hour")),
        )
    print(json.dumps({
        "batch_id": res.batch_id,
        "request_id": res.request_id,
        "skipped": res.skipped,
        "input_rows": res.input_rows,
        "routed_rows": res.routed_rows,
        "per_sink_rows": res.per_sink_rows,
        "snapshot_ids": res.snapshot_ids,
        "elapsed_sec": round(res.elapsed_sec, 3),
        "turns_per_sec": round(res.turns_per_sec, 1),
        **({"daily_rollup": rollup} if rollup is not None else {}),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
