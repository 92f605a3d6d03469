"""Write-audit-publish (swarm_spark/wap.py + tablestore stage/publish)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from swarm_spark.tablestore import IcepackCatalog
from swarm_spark.wap import AuditFailed, write_audit_publish


@pytest.fixture()
def t(tmp_path):
    return IcepackCatalog(str(tmp_path)).table("t")


GOOD = [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)]
BAD = [(4, "a", 10.0), (4, "zz", -5.0)]  # dup id, bad enum, below range
SCHEMA = "id bigint, cat string, x double"
RULES = [
    ("not_null", "id"),
    ("unique", ["id"]),
    ("accepted_values", "cat", ["a", "b"]),
    ("range", "x", 0.0, 100.0),
]


class TestStagePrimitives:
    def test_staged_data_invisible_until_publish(self, spark, t):
        t.append(spark.createDataFrame(GOOD, SCHEMA))
        h = t.stage(spark.createDataFrame(BAD, SCHEMA))
        assert t.read(spark).count() == 3  # staged rows NOT visible
        assert t.read_stage(spark, h).count() == 2
        snap = t.publish_stage(h)
        assert snap["added_rows"] == 2
        assert t.read(spark).count() == 5

    def test_publish_is_metadata_only(self, spark, t):
        """The staged dir is adopted, not rewritten: the same files
        (same inode paths modulo the rename into data/) land in the
        snapshot."""
        h = t.stage(spark.createDataFrame(GOOD, SCHEMA))
        files_before = sorted(
            f for _, _, fs in os.walk(h["stage_dir"]) for f in fs
            if f.endswith(".parquet"))
        snap = t.publish_stage(h)
        d = snap["data_dirs"][-1]
        files_after = sorted(
            f for _, _, fs in os.walk(d) for f in fs if f.endswith(".parquet"))
        assert files_before == files_after  # byte-for-byte the same files

    def test_abort_reclaims(self, spark, t):
        h = t.stage(spark.createDataFrame(GOOD, SCHEMA))
        t.abort_stage(h)
        assert not os.path.isdir(h["stage_dir"])
        assert not t.exists()


class TestWriteAuditPublish:
    def test_good_batch_publishes_with_evidence(self, spark, t):
        snap = write_audit_publish(spark, t,
                                   spark.createDataFrame(GOOD, SCHEMA), RULES)
        assert snap["added_rows"] == 3
        assert all(r["passed"] for r in snap["audit"])
        assert "wap_audit" in t.current_snapshot()  # evidence on snapshot
        assert t.read(spark).count() == 3

    def test_bad_batch_never_becomes_visible(self, spark, t):
        write_audit_publish(spark, t, spark.createDataFrame(GOOD, SCHEMA),
                            RULES)
        with pytest.raises(AuditFailed) as ei:
            write_audit_publish(spark, t, spark.createDataFrame(BAD, SCHEMA),
                                RULES)
        # precise failure report, table untouched, stage reclaimed
        failed = {(r["rule"], r["target"]) for r in ei.value.report
                  if not r["passed"]}
        assert failed == {("unique", "id"), ("accepted_values", "cat"),
                          ("range", "x")}
        assert t.current_snapshot()["snapshot_id"] == 1
        assert t.read(spark).count() == 3
        assert t.remove_orphan_files(older_than_sec=0)["orphans_removed"] == 0

    def test_audit_runs_on_staged_files_not_input_plan(self, spark, t):
        """What is audited is what is published: the audit reads the
        staged parquet, so a nondeterministic input plan cannot sneak
        different rows past the gate."""
        df = spark.createDataFrame(GOOD, SCHEMA)
        h = t.stage(df)
        staged = t.read_stage(spark, h)
        assert sorted(tuple(r) for r in staged.collect()) == sorted(GOOD)
        t.abort_stage(h)

    def test_referential_rule_in_gate(self, spark, t):
        dim = spark.createDataFrame([("a",), ("b",)], "k string")
        write_audit_publish(
            spark, t, spark.createDataFrame(GOOD, SCHEMA),
            [("referential", "cat", dim, "k")])
        with pytest.raises(AuditFailed):
            write_audit_publish(
                spark, t,
                spark.createDataFrame([(9, "zz", 1.0)], SCHEMA),
                [("referential", "cat", dim, "k")])
        assert t.read(spark).count() == 3


class TestPipelineAuditGate:
    def _mkpipe(self, spark, tmp_path, expectations):
        from swarm_spark.pipeline import IngestPipeline, PipelineConfig
        from swarm_spark.presets import (
            default_event_rules,
            default_schema_rules,
            default_tool_dim,
        )

        return IngestPipeline(spark, PipelineConfig(
            event_rules=default_event_rules(),
            schema_rules=default_schema_rules(),
            warehouse=str(tmp_path / "wh"),
            tool_dim=default_tool_dim(spark),
            sink_expectations=expectations,
        ))

    def test_good_batch_passes_gate(self, spark, tmp_path):
        from swarm_spark.datagen import generate_transcripts

        t = generate_transcripts(spark, 500, n_convs=10, seed=3)
        pipe = self._mkpipe(spark, tmp_path, {
            "*": [("not_null", "id"), ("unique", ["id"])],
        })
        res = pipe.run(t, batch_id="ok1")
        assert not res.skipped and res.routed_rows > 0

    def test_poisoned_batch_aborts_every_sink(self, spark, tmp_path):
        """An impossible expectation fails the audit: no sink table is
        created/advanced, the batch dir is reclaimed, and the audit
        table records the failure."""
        import os

        from swarm_spark.datagen import generate_transcripts
        from swarm_spark.wap import AuditFailed

        t = generate_transcripts(spark, 500, n_convs=10, seed=3)
        pipe = self._mkpipe(spark, tmp_path, {
            "*": [("accepted_values", "role", ["nobody"])],
        })
        with pytest.raises(AuditFailed, match="accepted_values"):
            pipe.run(t, batch_id="bad1")
        for s in pipe.catalog.tables():
            if s.startswith("sink_"):
                raise AssertionError(f"sink {s} exists after failed audit")
        bdir = str(tmp_path / "wh" / "_batch")
        assert not os.path.isdir(bdir) or os.listdir(bdir) == []
        # the gate is batch-scoped: a later clean config run proceeds
        pipe2 = self._mkpipe(spark, tmp_path, None)
        res = pipe2.run(t, batch_id="ok2")
        assert res.routed_rows > 0
