"""Dynamic-payload JSON ingestion — the open-schema twin of
pipeline.IngestPipeline, covering swarm's actual object flow
(/root/reference/pkg/usecase/load.go:188-252): JSON documents of
UNKNOWN shape are parsed, nil-stripped, content-hashed, timestamped,
routed, and appended to sink tables whose schemas are INFERRED per
batch and union-merged monotonically with the live table schema
(pkg/usecase/bigquery.go:15-62).

Pipeline:  files → read_multidoc_json → event-route on object path →
           explode_records → nil-strip (Arrow UDF) → id/ts envelope →
           per-sink: infer schema → from_json(payload) → icepack
           append (union-by-name evolution, conflict = hard error)

The schema-inference pass is one extra scan of each sink's records —
exactly the cost swarm pays in bqs.Infer over every record; here it
is Spark's parallel JSON schema inference instead of per-row Go
reflection.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.normalize import content_hash_json_udf, nil_strip_json_udf
from .manifest import STATE_COMPLETED, STATE_FAILED, ManifestStore
from .rules import EventRule, route
from .tablestore import IcepackCatalog


@dataclass(frozen=True)
class JsonSchemaRule:
    """Per-schema transform config for open JSON payloads — the Log
    construction contract of model/policy.go:64-89.

    ts_format mirrors the time handling seen in the reference's rules:
      'unix'     float/int seconds (load.go:236-239)
      'unix_ms'  milliseconds (README.md:55 divides by 1000 in Rego)
      'rfc3339'  ISO-8601 strings (time.parse_rfc3339_ns,
                 pkg/usecase/testdata/policy/schema.rego:8)

    record_predicate optionally gates individual records AFTER the
    event-level match — the per-record conditional routing Rego schema
    rules can express (a non-matching record is skipped with the same
    warn+skip semantics as a 0-match schema rule, load.go:216-219).
    It is a (json_path, op, value) triple evaluated on the record.
    """

    schema_name: str
    sink_table: str
    partition_unit: str = ""
    ts_path: str = "$.timestamp"
    ts_format: str = "unix"        # unix | unix_ms | rfc3339
    id_path: str = ""              # '' → content hash (types.go:27-34)
    records_field: str = "Records"
    drop_paths: tuple = field(default_factory=tuple)
    record_predicate: tuple | None = None  # (json_path, op, value)

    def __post_init__(self):
        if self.ts_format not in ("unix", "unix_ms", "rfc3339"):
            raise ValueError(f"invalid ts_format {self.ts_format!r}")
        if self.record_predicate is not None:
            path, op, _ = self.record_predicate
            if op not in ("eq", "startswith", "endswith", "contains", "rlike"):
                raise ValueError(f"invalid record_predicate op {op!r}")
            if not path.startswith("$."):
                raise ValueError("record_predicate path must start with '$.'")


def make_drop_udf(paths: tuple):
    """json.patch-remove analogue (README.md:56): drop top-level keys
    from a JSON object column. Arrow-batched."""
    import pandas as pd
    from pyspark.sql import types as T

    keys = [p.lstrip("$.") for p in paths]

    @F.pandas_udf(T.StringType())
    def drop(docs: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                v = json.loads(s)
            except (ValueError, TypeError):
                return s
            if isinstance(v, dict):
                for k in keys:
                    v.pop(k, None)
            return json.dumps(v, sort_keys=True, separators=(",", ":"))

        return docs.map(one)

    return drop


class JsonIngest:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        event_rules: list[EventRule],
        schema_rules: list[JsonSchemaRule],
        manifest_dir: str | None = None,
    ):
        self.spark = spark
        self.catalog = IcepackCatalog(warehouse)
        self.event_rules = event_rules
        self.rules = {r.schema_name: r for r in schema_rules}
        self.manifest = ManifestStore(manifest_dir or f"{warehouse}/_manifest")
        for er in event_rules:
            if er.schema_name not in self.rules:
                raise ValueError(f"event rule {er.rule_id} → unknown schema {er.schema_name}")

    # -- plan ----------------------------------------------------------
    def records(self, path: str | list[str]) -> DataFrame:
        """files → documents → event routing → per-record explode →
        normalized record rows with envelope columns."""
        from .sources.objects import explode_records, read_multidoc_json

        docs = read_multidoc_json(self.spark, path)
        routed = route(docs, self.event_rules, on_unmatched="error")
        out = []
        for schema_name, r in self.rules.items():
            part = routed.filter(F.col("schema_name") == schema_name)
            recs = explode_records(part, records_field=r.records_field)
            if r.record_predicate is not None:
                path, op, value = r.record_predicate
                fieldcol = F.get_json_object(F.col("record"), path)
                pred = {
                    "eq": fieldcol == F.lit(value),
                    "startswith": fieldcol.startswith(value),
                    "endswith": fieldcol.endswith(value),
                    "contains": fieldcol.contains(value),
                    "rlike": fieldcol.rlike(value),
                }[op]
                recs = recs.filter(pred)  # 0-match → skip (load.go:216-219)
            data = nil_strip_json_udf(F.col("record"))
            ts_str = F.get_json_object(F.col("record"), r.ts_path)
            if r.ts_format == "unix":
                ts_raw = ts_str.cast("double")
            elif r.ts_format == "unix_ms":
                ts_raw = ts_str.cast("double") / 1000.0  # README.md:55
            else:  # rfc3339 (time.parse_rfc3339_ns analogue)
                ts_raw = F.unix_micros(F.to_timestamp(ts_str)) / 1_000_000.0
            if r.drop_paths:
                data = make_drop_udf(tuple(r.drop_paths))(data)
            rec = (
                recs.withColumn("data", data)
                .withColumn(
                    "id",
                    F.coalesce(
                        F.get_json_object(F.col("record"), r.id_path) if r.id_path else F.lit(None),
                        content_hash_json_udf(F.col("data")),
                    ),
                )
                # timestamp>0 required (Log.Validate, policy.go:73-89):
                # records with no/invalid ts are dropped with the same
                # warn+skip semantics as a 0-match schema rule
                .withColumn("timestamp", F.timestamp_seconds(ts_raw))
                .filter(F.col("timestamp").isNotNull())
                .select("schema_name", "path", "id", "timestamp", "data")
            )
            out.append(rec)
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    # -- schema-only dry run (≙ `swarm schema`, pkg/usecase/schema.go:13-90:
    # run the full parse+infer+evolve path, insert NOTHING) -------------
    def schema_only(self, path: str | list[str]) -> dict[str, str]:
        """Apply schema inference + table create/evolve without
        inserting rows. Returns {sink_table: merged schema json}."""
        recs = self.records(path).persist()
        out: dict[str, str] = {}
        try:
            for schema_name, r in self.rules.items():
                docs_only = recs.filter(F.col("schema_name") == schema_name).select("data")
                if docs_only.isEmpty():
                    continue
                inferred = self.spark.read.json(
                    docs_only.rdd.map(lambda row: row["data"])
                ).schema
                envelope = recs.filter(F.col("schema_name") == schema_name).select(
                    "id",
                    F.lit("schema-dry-run").alias("ingest_id"),
                    "timestamp",
                    F.current_timestamp().alias("ingested_at"),
                    F.from_json("data", inferred).alias("data"),
                )
                t = self.catalog.table(r.sink_table)
                t.append(envelope.limit(0), partition_unit=r.partition_unit,
                         ts_col="timestamp")
                out[r.sink_table] = t.schema().json()
        finally:
            recs.unpersist()
        return out

    # -- dump sink (≙ swarm --dry-run NDJSON dump,
    # pkg/infra/dump/client.go:47-104 — the golden-output mechanism) ----
    def dump(self, path: str | list[str], out_dir: str) -> dict[str, str]:
        """Write routed records as NDJSON per sink + schema JSON files;
        no tables touched."""
        import os

        recs = self.records(path).persist()
        written: dict[str, str] = {}
        try:
            os.makedirs(out_dir, exist_ok=True)
            for schema_name, r in self.rules.items():
                part = recs.filter(F.col("schema_name") == schema_name)
                if part.isEmpty():
                    continue
                dst = os.path.join(out_dir, f"{r.sink_table}.log")
                part.select("id", "timestamp", "data").coalesce(1).write.mode(
                    "overwrite"
                ).json(dst)
                inferred = self.spark.read.json(
                    part.select("data").rdd.map(lambda row: row["data"])
                ).schema
                with open(os.path.join(out_dir, f"{r.sink_table}.schema.json"), "w") as fh:
                    fh.write(inferred.json())
                written[r.sink_table] = dst
        finally:
            recs.unpersist()
        return written

    # -- execute -------------------------------------------------------
    def run(self, path: str, batch_id: str, request_id: str | None = None) -> dict:
        request_id = request_id or uuid.uuid4().hex
        state, acquired = self.manifest.get_or_create(batch_id, request_id)
        if not acquired:
            return {"batch_id": batch_id, "skipped": True,
                    "snapshot_ids": state.snapshot_ids or {}}
        t0 = time.time()
        try:
            recs = self.records(path).persist()
            recs.count()
            snapshot_ids: dict[str, int] = {}
            per_sink: dict[str, int] = {}
            schemas_json: dict[str, str] = {}
            for schema_name, r in self.rules.items():
                part = recs.filter(F.col("schema_name") == schema_name)
                docs_only = part.select("data")
                if docs_only.isEmpty():
                    continue
                # batch schema inference ≙ fold of bqs.Infer+Merge
                # (bigquery.go:47-62) — Spark infers in parallel
                inferred = self.spark.read.json(
                    docs_only.rdd.map(lambda row: row["data"])
                ).schema
                out = part.select(
                    "id",
                    F.lit(request_id).alias("ingest_id"),
                    "timestamp",
                    F.current_timestamp().alias("ingested_at"),
                    F.from_json("data", inferred).alias("data"),
                )
                snap = self.catalog.table(r.sink_table).append(
                    out, partition_unit=r.partition_unit, ts_col="timestamp"
                )
                snapshot_ids[r.sink_table] = snap["snapshot_id"]
                per_sink[r.sink_table] = snap["added_rows"]
                schemas_json[r.sink_table] = inferred.json()

            audit = self.spark.createDataFrame(
                [(request_id, batch_id, True, None,
                  json.dumps(schemas_json), json.dumps(per_sink))],
                "request_id string, batch_id string, success boolean, error string, "
                "table_schemas string, log_counts string",
            ).withColumn("started_at", F.current_timestamp())
            self.catalog.table("_audit_json").append(
                audit, partition_unit="month", ts_col="started_at"
            )
            recs.unpersist()
            self.manifest.update(batch_id, STATE_COMPLETED, snapshot_ids)
            return {
                "batch_id": batch_id, "skipped": False,
                "per_sink_rows": per_sink, "snapshot_ids": snapshot_ids,
                "elapsed_sec": time.time() - t0,
            }
        except Exception:
            self.manifest.update(batch_id, STATE_FAILED)
            raise
