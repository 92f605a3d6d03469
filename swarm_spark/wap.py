"""Write-audit-publish (WAP): gate table promotion on data-quality
expectations — the Iceberg branch-write / `spark.wap.id` pattern over
icepack's stage/publish primitives.

A training-data or telemetry pipeline must not let a bad batch become
visible: stage the write (files on disk, CURRENT untouched), run the
expectation suite over ONLY the staged rows, and publish — a pure
metadata commit — iff every rule passes. A failed audit aborts the
stage; nothing was ever readable. The audit report (rule → counts)
rides the published snapshot's metadata, so every snapshot carries
the evidence it was admitted on.

Cost model at 100 TB: the data is written ONCE (staging is the
ordinary partitioned write); the audit is one aggregate job over the
staged increment (operators/expectations.py fuses all row rules into
a single pass); publish is O(metadata). Compare with
validate-then-append, which either writes twice or risks a window
where unvalidated data is live.

Reference analogue: swarm validates schema-rule output before the
BigQuery insert and counts failures per source
(/root/reference/pkg/usecase/ingest.go); WAP is that gate made
transactional at the table layer.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from swarm_spark.operators.expectations import validate

__all__ = ["AuditFailed", "write_audit_publish"]


class AuditFailed(RuntimeError):
    """Raised when a staged write fails its expectation suite; the
    stage has been aborted and the table is untouched. `.report`
    holds the full (rule, target, checked, violations, passed) rows."""

    def __init__(self, msg: str, report: list[dict]):
        super().__init__(msg)
        self.report = report


def write_audit_publish(
    spark: SparkSession,
    table,
    df: DataFrame,
    rules: list[tuple],
    partition_unit: str = "",
    ts_col: str = "timestamp",
    extra_meta: dict | None = None,
) -> dict:
    """Stage `df` into `table`, audit the STAGED FILES (not the input
    plan — what is audited is byte-identical to what is published)
    against `rules` (operators/expectations.py forms), then publish.

    Returns the published snapshot dict plus `audit` (the report
    rows). Raises AuditFailed — after aborting the stage — if any rule
    fails; the table is untouched."""
    handle = table.stage(df, partition_unit=partition_unit, ts_col=ts_col)
    try:
        report = [r.asDict() for r in
                  validate(table.read_stage(spark, handle), rules).collect()]
    except Exception:
        table.abort_stage(handle)
        raise
    failed = [r for r in report if not r["passed"]]
    if failed:
        table.abort_stage(handle)
        detail = "; ".join(
            f"{r['rule']}({r['target']}): {r['violations']}/{r['checked']}"
            for r in failed)
        raise AuditFailed(f"audit failed — {detail}", report)
    meta = dict(extra_meta or {})
    # compact audit evidence rides the snapshot (full report returned)
    meta.setdefault("wap_audit", json.dumps(
        [[r["rule"], r["target"], r["checked"], r["violations"]]
         for r in report]))
    snap = table.publish_stage(handle, extra_meta=meta)
    return {**snap, "audit": report}
