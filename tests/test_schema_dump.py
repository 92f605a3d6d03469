"""M5 schema-only dry run + K4 dump sink."""

from __future__ import annotations

import json
import os

from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
from swarm_spark.rules import EventRule

RULES = [JsonSchemaRule("s", sink_table="logs", ts_path="$.event_time",
                        id_path="$.log_id")]
EVENTS = [EventRule("e", "path", "endswith", ".log", "s")]


def _write(path, lines):
    with open(str(path), "w") as fh:
        fh.write("\n".join(json.dumps(x) for x in lines))


def test_schema_only_creates_empty_evolved_table(spark, tmp_path):
    src = tmp_path / "a.log"
    _write(src, [{"log_id": "x", "event_time": 1.0, "name": "n"}])
    ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
    schemas = ing.schema_only(str(src))
    assert "logs" in schemas
    t = ing.catalog.table("logs")
    assert t.read(spark).count() == 0  # no rows inserted
    assert "name" in [f.name for f in t.schema()["data"].dataType.fields]

    # a later real run evolves on top and inserts
    src2 = tmp_path / "b.log"
    _write(src2, [{"log_id": "y", "event_time": 2.0, "age": 3}])
    ing.run(str(src2), batch_id="b1")
    fields = [f.name for f in t.schema()["data"].dataType.fields]
    assert fields == ["event_time", "log_id", "name", "age"]
    assert t.read(spark).count() == 1


def test_dump_sink_ndjson_and_schema(spark, tmp_path):
    src = tmp_path / "a.log"
    _write(src, [{"log_id": "x", "event_time": 1.0, "v": 1},
                 {"log_id": "y", "event_time": 2.0, "v": 2}])
    ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
    out = ing.dump(str(src), str(tmp_path / "dump"))
    assert "logs" in out
    rows = spark.read.json(out["logs"]).collect()
    assert sorted(r.id for r in rows) == ["x", "y"]
    schema_file = tmp_path / "dump" / "logs.schema.json"
    assert os.path.exists(schema_file)
    sch = json.loads(schema_file.read_text())
    assert {f["name"] for f in sch["fields"]} >= {"log_id", "event_time", "v"}
    # dump writes no tables
    assert ing.catalog.tables() == []
