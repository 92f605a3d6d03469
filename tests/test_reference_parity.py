"""Run the REFERENCE'S OWN test objects through the rebuild and pin
its golden outputs — the 'matches the reference's results on its own
test queries' check.

Source of truth: /root/reference/pkg/usecase/load_test.go:54-130
(TestLoadData) loads testdata/object/cloudtrail_example.json(.gz)
through the event+schema Rego policies (testdata/policy/event.rego,
schema.rego) and expects 4 data rows with the four eventID LogIDs.
The schema rule maps id=r.eventID, timestamp=parse_rfc3339(r.eventTime)
(truncated to µs), timeunit=month, data=r.

The fixtures are read IN PLACE from the read-only reference checkout —
nothing is copied into this repo.
"""

from __future__ import annotations

import os

import pytest

from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
from swarm_spark.rules import EventRule

REF_OBJ = "/root/reference/pkg/usecase/testdata/object"

GOLDEN_IDS = {
    "ac3cfd93-435d-41cc-bbd7-aad0340ec668",
    "18e67b09-94a3-4b5c-9b3a-cd549b3341fb",
    "dbb28938-5ed4-4774-8bb6-82ea916b21bb",
    "d4dacb9d-9822-4217-b88d-d334bde89755",
}  # load_test.go:116-121

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_OBJ), reason="reference checkout not present"
)


def _rules():
    # event.rego: bucket cloudtrail-logs + name endswith .log/.gz →
    # schema cloudtrail (json parser; gzip transparent in Spark)
    events = [
        EventRule("ct_log", "path", "endswith", ".json", "cloudtrail"),
        EventRule("ct_gz", "path", "endswith", ".json.gz", "cloudtrail"),
    ]
    # schema.rego: id=eventID, ts=parse_rfc3339(eventTime), timeunit month
    schemas = [JsonSchemaRule(
        "cloudtrail", sink_table="cloudtrail", partition_unit="month",
        ts_path="$.eventTime", ts_format="rfc3339", id_path="$.eventID",
    )]
    return events, schemas


@needs_ref
@pytest.mark.parametrize("obj", ["cloudtrail_example.json",
                                 "cloudtrail_example.json.gz"])
def test_reference_cloudtrail_object_golden(spark, tmp_path, obj):
    """Both the plain and gzip objects land exactly the reference's 4
    records with its LogIDs (load_test.go TestLoadData)."""
    events, schemas = _rules()
    ing = JsonIngest(spark, str(tmp_path / "wh"), events, schemas)
    res = ing.run(os.path.join(REF_OBJ, obj), batch_id="ref")
    assert res["per_sink_rows"] == {"cloudtrail": 4}

    rows = ing.catalog.table("cloudtrail").read(spark).collect()
    assert {r.id for r in rows} == GOLDEN_IDS
    # schema.rego truncates to µs via ns/1000*1000*1000; eventTime has
    # whole seconds here — timestamps must be exact
    by_id = {r.id: r for r in rows}
    t = by_id["d4dacb9d-9822-4217-b88d-d334bde89755"].timestamp
    assert (t.year, t.month, t.day, t.hour, t.minute, t.second) == \
        (2020, 3, 2, 23, 55, 50)
    # data = r (the whole record, nil-stripped): spot fields survive
    d = by_id["ac3cfd93-435d-41cc-bbd7-aad0340ec668"].data
    assert d.eventSource == "s3.amazonaws.com"
    assert d.awsRegion == "ap-northeast-1"
    # month partition transform (timeunit: "month")
    snap = ing.catalog.table("cloudtrail").current_snapshot()
    assert snap["partition_unit"] == "month"
    (ddir,) = snap["data_dirs"]
    parts = [p for p in os.listdir(ddir) if p.startswith("_p=")]
    assert parts == ["_p=2020-03"]


@needs_ref
def test_gzip_and_plain_byte_parity(spark, tmp_path):
    """The .gz and plain objects must produce IDENTICAL table contents
    (the reference runs both through one golden, S4 gzip parity)."""
    events, schemas = _rules()
    outs = []
    for i, obj in enumerate(["cloudtrail_example.json",
                             "cloudtrail_example.json.gz"]):
        ing = JsonIngest(spark, str(tmp_path / f"wh{i}"), events, schemas)
        ing.run(os.path.join(REF_OBJ, obj), batch_id="ref")
        pdf = (ing.catalog.table("cloudtrail").read(spark)
               .drop("ingest_id", "ingested_at")
               .toPandas().sort_values("id").reset_index(drop=True))
        outs.append(pdf)
    import pandas as pd

    pd.testing.assert_frame_equal(outs[0], outs[1])
