"""Migrate, backfill planner, skew helpers, plan-shape assertions,
py-files packaging."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


class TestMigrate:
    def test_copy_and_evolve(self, spark, tmp_path):
        from swarm_spark.migrate import migrate
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(str(tmp_path))
        cat.table("src").append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"))
        cat.table("dst").append(spark.createDataFrame([(0, True)], "id bigint, flag boolean"))
        res = migrate(spark, cat, "src", "dst")
        assert res["rows_copied"] == 2
        df = cat.table("dst").read(spark).orderBy("id").toPandas()
        assert list(df.columns) == ["id", "flag", "v"]  # union evolution
        assert df.id.tolist() == [0, 1, 2]

    def test_where_predicate(self, spark, tmp_path):
        from swarm_spark.migrate import migrate
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(str(tmp_path))
        cat.table("src").append(spark.createDataFrame([(i,) for i in range(10)], "id bigint"))
        res = migrate(spark, cat, "src", "dst2", where="id >= 7")
        assert res["rows_copied"] == 3

    def test_conflict_blocks(self, spark, tmp_path):
        from swarm_spark.migrate import migrate
        from swarm_spark.tablestore import IcepackCatalog, SchemaConflictError

        cat = IcepackCatalog(str(tmp_path))
        cat.table("src").append(spark.createDataFrame([("s",)], "v string"))
        cat.table("dst3").append(spark.createDataFrame([(1,)], "v bigint"))
        with pytest.raises(SchemaConflictError):
            migrate(spark, cat, "src", "dst3")


class TestBackfill:
    def _mk_files(self, tmp_path, n, size=100):
        d = tmp_path / "objs"
        d.mkdir()
        for i in range(n):
            (d / f"f{i:03d}.log").write_text(
                json.dumps({"log_id": f"l{i}", "event_time": float(i + 1)}) + "x" * size
            )
        return str(d)

    def test_plan_batching_by_count(self, tmp_path):
        from swarm_spark.backfill import plan_backfill

        d = self._mk_files(tmp_path, 10)
        batches = plan_backfill(d, max_objects=4, max_bytes=10**9)
        assert [b.n_objects for b in batches] == [4, 4, 2]
        assert batches[0].batch_id == "backfill-000000"

    def test_plan_batching_by_bytes(self, tmp_path):
        from swarm_spark.backfill import plan_backfill

        d = self._mk_files(tmp_path, 6, size=1000)
        sz = os.path.getsize(os.path.join(d, "f000.log"))
        batches = plan_backfill(d, max_objects=100, max_bytes=2 * sz + 1)
        assert all(b.total_bytes <= 2 * sz + 1 for b in batches)
        assert sum(b.n_objects for b in batches) == 6

    def test_plan_deterministic(self, tmp_path):
        from swarm_spark.backfill import plan_backfill

        d = self._mk_files(tmp_path, 7)
        a = plan_backfill(d, max_objects=3)
        b = plan_backfill(d, max_objects=3)
        assert a == b

    def test_run_backfill_resumable(self, spark, tmp_path):
        from swarm_spark.backfill import plan_backfill, run_backfill
        from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
        from swarm_spark.rules import EventRule

        d = self._mk_files(tmp_path, 6, size=0)
        ing = JsonIngest(
            spark, str(tmp_path / "wh"),
            [EventRule("e", "path", "endswith", ".log", "s")],
            [JsonSchemaRule("s", sink_table="logs", ts_path="$.event_time",
                            id_path="$.log_id")],
        )
        batches = plan_backfill(d, max_objects=2)
        assert len(batches) == 3
        res1 = run_backfill(ing, batches)
        assert ing.catalog.table("logs").read(spark).count() == 6
        res2 = run_backfill(ing, batches)  # full re-run → all skipped
        assert all(r["skipped"] for r in res2)
        assert ing.catalog.table("logs").read(spark).count() == 6


class TestPlanShape:
    def test_routed_plan_is_broadcast_no_smj(self, spark, tmp_path):
        from swarm_spark.datagen import generate_transcripts
        from swarm_spark.pipeline import IngestPipeline, PipelineConfig
        from swarm_spark.plans.skew import assert_broadcast_join
        from swarm_spark.presets import (
            default_event_rules, default_schema_rules, default_tool_dim,
        )

        cfg = PipelineConfig(default_event_rules(), default_schema_rules(),
                             str(tmp_path / "wh"), tool_dim=default_tool_dim(spark))
        pipe = IngestPipeline(spark, cfg)
        t = generate_transcripts(spark, 100, n_convs=5)
        assert_broadcast_join(pipe.routed(t))

    def test_filter_pushdown_to_parquet(self, spark, sf_dir):
        from swarm_spark.plans.skew import assert_pushed_filters

        df = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_orderkey") == 7)
            .select("l_orderkey", "l_quantity")
        )
        assert_pushed_filters(df, "l_orderkey")

    def test_salted_count_equals_plain(self, spark):
        from swarm_spark.datagen import generate_transcripts
        from swarm_spark.plans.skew import salted_count

        t = generate_transcripts(spark, 2000, n_convs=20)
        plain = {(r.conv_id, r.role): r["count"]
                 for r in t.groupBy("conv_id", "role").count().collect()}
        salted = {(r.conv_id, r.role): r.n
                  for r in salted_count(t, ["conv_id", "role"], "turn_idx").collect()}
        assert plain == salted


class TestPackaging:
    def test_zip_importable(self, tmp_path):
        import subprocess
        import sys

        from tools.build_pyfiles import build

        out = build(str(tmp_path / "swarm_spark.zip"))
        code = (
            f"import sys; sys.path.insert(0, {out!r}); "
            "import swarm_spark.pipeline, swarm_spark.operators.dedup, "
            "swarm_spark.streaming.ingest; print('ok')"
        )
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        assert r.stdout.strip() == "ok", r.stderr
