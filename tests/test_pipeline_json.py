"""Dynamic-payload ingest: schema inference, monotonic evolution,
nil-strip + content-hash + float-ts semantics end to end."""

from __future__ import annotations

import gzip
import json

import pytest

from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
from swarm_spark.rules import EventRule


def _write(path, content, gz=False):
    if gz:
        with gzip.open(str(path), "wt") as fh:
            fh.write(content)
    else:
        with open(str(path), "w") as fh:
            fh.write(content)


RULES = [JsonSchemaRule("access_log", sink_table="logs",
                        ts_path="$.event_time", id_path="$.log_id")]
EVENTS = [EventRule("e1", "path", "endswith", ".log", "access_log")]

LOG_LINES = "\n".join([
    json.dumps({"log_id": "a1", "event_time": 1500000000.25,
                "remote_ip": "10.0.0.1", "action": "get", "success": True,
                "junk": None}),
    json.dumps({"log_id": "a2", "event_time": 1500000060.0,
                "remote_ip": "10.0.0.2", "action": "put", "success": False}),
])


class TestJsonIngest:
    def test_end_to_end(self, spark, tmp_path):
        src = tmp_path / "in.log"
        _write(src, LOG_LINES)
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
        res = ing.run(str(src), batch_id="b1")
        assert res["per_sink_rows"] == {"logs": 2}

        out = ing.catalog.table("logs").read(spark).orderBy("id").collect()
        assert [r.id for r in out] == ["a1", "a2"]
        assert out[0].timestamp.microsecond == 250000  # float-sec fraction
        d = out[0].data.asDict()
        assert d["remote_ip"] == "10.0.0.1" and d["success"] is True
        assert "junk" not in d  # nil-stripped before inference

    def test_schema_evolution_monotonic(self, spark, tmp_path):
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
        _write(tmp_path / "one.log",
               json.dumps({"log_id": "x", "event_time": 1.0, "name": "n"}))
        ing.run(str(tmp_path / "one.log"), batch_id="b1")
        _write(tmp_path / "two.log",
               json.dumps({"log_id": "y", "event_time": 2.0, "age": 30}))
        ing.run(str(tmp_path / "two.log"), batch_id="b2")

        t = ing.catalog.table("logs")
        fields = [f.name for f in t.schema()["data"].dataType.fields]
        # union, old order preserved, new appended (migrate_test.go:77-113)
        assert fields == ["event_time", "log_id", "name", "age"]
        got = {r.id: r.data.asDict() for r in t.read(spark).collect()}
        assert got["x"]["name"] == "n" and got["x"]["age"] is None
        assert got["y"]["age"] == 30 and got["y"]["name"] is None

    def test_type_conflict_fails_batch(self, spark, tmp_path):
        from swarm_spark.tablestore import SchemaConflictError

        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
        _write(tmp_path / "one.log",
               json.dumps({"log_id": "x", "event_time": 1.0, "age": 30}))
        ing.run(str(tmp_path / "one.log"), batch_id="b1")
        _write(tmp_path / "two.log",
               json.dumps({"log_id": "y", "event_time": 2.0, "age": "thirty"}))
        with pytest.raises(SchemaConflictError):
            ing.run(str(tmp_path / "two.log"), batch_id="b2")
        st = ing.manifest.get("b2")
        assert st.state == "failed"
        assert ing.catalog.table("logs").read(spark).count() == 1  # intact

    def test_content_hash_id_when_no_id_path(self, spark, tmp_path):
        rules = [JsonSchemaRule("access_log", sink_table="logs",
                                ts_path="$.event_time")]
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, rules)
        _write(tmp_path / "one.log",
               json.dumps({"event_time": 1.0, "v": 1}) + "\n"
               + json.dumps({"v": 1, "event_time": 1.0}))
        ing.run(str(tmp_path / "one.log"), batch_id="b1")
        ids = [r.id for r in ing.catalog.table("logs").read(spark).collect()]
        # same canonical payload → same content hash (types.go:27-34)
        assert len(ids) == 2 and ids[0] == ids[1] and len(ids[0]) == 32

    def test_records_without_ts_skipped(self, spark, tmp_path):
        _write(tmp_path / "one.log",
               json.dumps({"log_id": "ok", "event_time": 5.0}) + "\n"
               + json.dumps({"log_id": "no_ts"}))
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
        res = ing.run(str(tmp_path / "one.log"), batch_id="b1")
        assert res["per_sink_rows"] == {"logs": 1}

    def test_batch_doc_explode_and_gzip(self, spark, tmp_path):
        doc = json.dumps({"Records": [
            {"log_id": f"r{i}", "event_time": 100.0 + i} for i in range(4)
        ]})
        _write(tmp_path / "batch.log.gz", doc, gz=True)
        ing = JsonIngest(spark, str(tmp_path / "wh"),
                         [EventRule("e", "path", "endswith", ".log.gz", "access_log")],
                         RULES)
        res = ing.run(str(tmp_path / "batch.log.gz"), batch_id="b1")
        assert res["per_sink_rows"] == {"logs": 4}

    def test_resume_skip(self, spark, tmp_path):
        _write(tmp_path / "one.log", json.dumps({"log_id": "x", "event_time": 1.0}))
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
        r1 = ing.run(str(tmp_path / "one.log"), batch_id="b1")
        r2 = ing.run(str(tmp_path / "one.log"), batch_id="b1")
        assert r2["skipped"] and r2["snapshot_ids"] == r1["snapshot_ids"]


class TestTsFormats:
    def test_unix_ms(self, spark, tmp_path):
        rules = [JsonSchemaRule("access_log", sink_table="logs",
                                ts_path="$.t", ts_format="unix_ms", id_path="$.log_id")]
        _write(tmp_path / "a.log", json.dumps({"log_id": "x", "t": 1500000000250}))
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, rules)
        ing.run(str(tmp_path / "a.log"), batch_id="b")
        (row,) = ing.catalog.table("logs").read(spark).collect()
        assert row.timestamp.year == 2017 and row.timestamp.microsecond == 250000

    def test_rfc3339(self, spark, tmp_path):
        rules = [JsonSchemaRule("access_log", sink_table="logs",
                                ts_path="$.t", ts_format="rfc3339", id_path="$.log_id")]
        _write(tmp_path / "a.log",
               json.dumps({"log_id": "x", "t": "2026-03-01T12:30:45.5Z"}))
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, rules)
        ing.run(str(tmp_path / "a.log"), batch_id="b")
        (row,) = ing.catalog.table("logs").read(spark).collect()
        assert (row.timestamp.year, row.timestamp.minute) == (2026, 30)
        assert row.timestamp.microsecond == 500000

    def test_invalid_format_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            JsonSchemaRule("s", sink_table="t", ts_format="epoch")


class TestRecordPredicate:
    def test_per_record_gating(self, spark, tmp_path):
        rules = [JsonSchemaRule(
            "access_log", sink_table="logs", ts_path="$.event_time",
            id_path="$.log_id",
            record_predicate=("$.action", "eq", "get"),
        )]
        _write(tmp_path / "a.log",
               json.dumps({"log_id": "k1", "event_time": 1.0, "action": "get"}) + "\n"
               + json.dumps({"log_id": "k2", "event_time": 2.0, "action": "put"}))
        ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, rules)
        res = ing.run(str(tmp_path / "a.log"), batch_id="b")
        assert res["per_sink_rows"] == {"logs": 1}
        (row,) = ing.catalog.table("logs").read(spark).collect()
        assert row.id == "k1"

    def test_invalid_predicate_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            JsonSchemaRule("s", sink_table="t",
                           record_predicate=("action", "eq", "x"))
