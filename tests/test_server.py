"""HTTP push serving path: Pub/Sub push envelope → policy gate →
per-message exactly-once → JsonIngest — the server.go:112-165 flow."""

from __future__ import annotations

import base64
import http.client
import json

import pytest

from swarm_spark.auth import AccessPolicy, AllowRule
from swarm_spark.manifest import ManifestStore
from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
from swarm_spark.rules import EventRule
from swarm_spark.server import IngestServer, make_object_handler

EVENTS = [EventRule("e", "path", "endswith", ".log", "access_log")]
RULES = [JsonSchemaRule("access_log", sink_table="logs",
                        ts_path="$.event_time", id_path="$.log_id")]


def _post(port, payload, path="/event/pubsub", headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=json.dumps(payload),
                 headers=headers or {})
    r = conn.getresponse()
    body = r.read().decode()
    conn.close()
    return r.status, body


def _get(port, path, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path, headers=headers or {})
    r = conn.getresponse()
    body = r.read().decode()
    conn.close()
    return r.status, body


def envelope(message_id, note):
    return {"message": {
        "messageId": message_id,
        "data": base64.b64encode(json.dumps(note).encode()).decode(),
    }}


@pytest.fixture()
def served(spark, tmp_path):
    ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
    srv = IngestServer(
        make_object_handler(ing),
        ManifestStore(str(tmp_path / "msg_manifest")),
    ).start()
    yield srv, ing
    srv.stop()


def _write_log(tmp_path, name="in.log", n=3):
    p = tmp_path / name
    with open(p, "w") as fh:
        for i in range(n):
            fh.write(json.dumps({"log_id": f"r{i}", "event_time": 100.0 + i}) + "\n")
    return str(p)


def test_push_ingests_and_acks(spark, tmp_path, served):
    srv, ing = served
    path = _write_log(tmp_path)
    status, body = _post(srv.port, envelope("m1", {"path": path}))
    assert status == 200, body
    assert ing.catalog.table("logs").read(spark).count() == 3


def test_redelivery_is_skipped(spark, tmp_path, served):
    """Pub/Sub redelivers at-least-once; a completed message id must
    ack WITHOUT reprocessing (server.go:129-133)."""
    srv, ing = served
    path = _write_log(tmp_path)
    s1, _ = _post(srv.port, envelope("m1", {"path": path}))
    s2, body2 = _post(srv.port, envelope("m1", {"path": path}))
    assert (s1, s2) == (200, 200)
    assert "skipped" in body2
    assert ing.catalog.table("logs").read(spark).count() == 3  # once


def test_failure_returns_500_then_retry_succeeds(spark, tmp_path, served):
    srv, ing = served
    status, _ = _post(srv.port, envelope("bad", {"path": str(tmp_path / "missing.log")}))
    assert status == 500  # failed → Pub/Sub will redeliver
    path = _write_log(tmp_path)
    status2, _ = _post(srv.port, envelope("bad", {"path": path}))
    assert status2 == 200  # failed state re-acquired (state.go:19-31)
    assert ing.catalog.table("logs").read(spark).count() == 3


def test_malformed_envelope_400(served):
    srv, _ = served
    status, _ = _post(srv.port, {"nope": 1})
    assert status == 400


def test_health_and_404(served):
    srv, _ = served
    assert _get(srv.port, "/health")[0] == 200
    assert _get(srv.port, "/nope")[0] == 404


def test_auth_policy_gates_requests(spark, tmp_path):
    """auth_token.rego flow over HTTP: default deny, bearer allows."""
    ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
    policy = AccessPolicy(allow_rules=[
        AllowRule("token", (("header.Authorization", "eq", "Bearer good-token"),)),
    ])
    srv = IngestServer(
        make_object_handler(ing),
        ManifestStore(str(tmp_path / "mm")),
        policy=policy,
    ).start()
    try:
        path = _write_log(tmp_path)
        env = envelope("m1", {"path": path})
        assert _post(srv.port, env)[0] == 403  # no token
        assert not ing.catalog.table("logs").exists()
        ok = {"Authorization": "Bearer good-token"}
        assert _post(srv.port, env, headers=ok)[0] == 200
        assert ing.catalog.table("logs").read(spark).count() == 3
        assert _get(srv.port, "/health", headers=ok)[0] == 200
        assert _get(srv.port, "/health")[0] == 403  # policy covers all paths
    finally:
        srv.stop()


def test_enqueue_publish_roundtrip(spark, tmp_path):
    """K5: plan_backfill → publish_backfill → push endpoint → ingest.
    Every planned batch lands exactly once, and re-publishing the whole
    plan is a no-op."""
    from swarm_spark.backfill import plan_backfill, publish_backfill

    src = tmp_path / "objs"
    src.mkdir()
    total = 0
    for i in range(5):
        with open(src / f"f{i}.log", "w") as fh:
            for j in range(4):
                fh.write(json.dumps({"log_id": f"d{i}-{j}",
                                     "event_time": 10.0 + j}) + "\n")
                total += 1

    ing = JsonIngest(spark, str(tmp_path / "wh"), EVENTS, RULES)
    srv = IngestServer(
        make_object_handler(ing),
        ManifestStore(str(tmp_path / "mm")),
    ).start()
    try:
        plan = plan_backfill(str(src), max_objects=2)
        assert len(plan) == 3  # 5 files packed 2+2+1
        res = publish_backfill(plan, "127.0.0.1", srv.port)
        assert [s for _, s in res] == [200, 200, 200]
        assert ing.catalog.table("logs").read(spark).count() == total
        # re-publish: every message acks as already-completed
        res2 = publish_backfill(plan, "127.0.0.1", srv.port)
        assert [s for _, s in res2] == [200, 200, 200]
        assert ing.catalog.table("logs").read(spark).count() == total
    finally:
        srv.stop()
