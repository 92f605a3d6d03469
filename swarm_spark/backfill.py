"""Backfill planner — the rebuild of `swarm enqueue`
(/root/reference/pkg/usecase/enqueue.go:15-73): enumerate input
objects under a prefix and batch them into work units bounded by
object count and total size (≤128 objects / ≤4 MiB per message,
usecase.go:35-36). Batches become batch_ids for the exactly-once
manifest, so a backfill is restartable at batch granularity.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

DEFAULT_MAX_OBJECTS = 128          # usecase.go:35
DEFAULT_MAX_BYTES = 4 * 1024 * 1024  # usecase.go:36


@dataclass(frozen=True)
class BackfillBatch:
    batch_id: str
    paths: tuple
    total_bytes: int

    @property
    def n_objects(self) -> int:
        return len(self.paths)


def plan_backfill(
    prefix: str,
    max_objects: int = DEFAULT_MAX_OBJECTS,
    max_bytes: int = DEFAULT_MAX_BYTES,
    batch_prefix: str = "backfill",
) -> list[BackfillBatch]:
    """List files under prefix (glob) and greedily pack them into
    batches: a batch closes when adding the next object would exceed
    either limit (an oversized single object still gets its own batch
    — same greedy shape as enqueue.go:50-66). Listing is sorted, so
    the plan — and hence every batch_id's content — is deterministic:
    re-running a partially-completed backfill re-derives identical
    batches and the manifest skips the completed ones."""
    if any(ch in prefix for ch in "*?["):
        paths = sorted(p for p in _glob.glob(prefix, recursive=True) if os.path.isfile(p))
    elif os.path.isdir(prefix):
        paths = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(prefix)
            for f in fs
            if not f.startswith((".", "_"))
        )
    else:
        paths = [prefix] if os.path.isfile(prefix) else []

    batches: list[BackfillBatch] = []
    cur: list[str] = []
    cur_bytes = 0
    for p in paths:
        sz = os.path.getsize(p)
        if cur and (len(cur) >= max_objects or cur_bytes + sz > max_bytes):
            batches.append(BackfillBatch(f"{batch_prefix}-{len(batches):06d}",
                                         tuple(cur), cur_bytes))
            cur, cur_bytes = [], 0
        cur.append(p)
        cur_bytes += sz
    if cur:
        batches.append(BackfillBatch(f"{batch_prefix}-{len(batches):06d}",
                                     tuple(cur), cur_bytes))
    return batches


def run_backfill(ingest, batches: list[BackfillBatch]) -> list[dict]:
    """Execute a plan against a JsonIngest: one exactly-once run per
    batch (completed batches skip via the manifest — the resumability
    contract of EP3/consumer-B, pkg/usecase/job.go:15-60)."""
    results = []
    for b in batches:
        results.append(ingest.run(",".join(b.paths), batch_id=b.batch_id))
    return results


def publish_backfill(
    batches: list[BackfillBatch],
    host: str,
    port: int,
    headers: dict | None = None,
    timeout_sec: float = 300.0,
) -> list[tuple[str, int]]:
    """Publish a backfill plan to an IngestServer push endpoint — the
    `swarm enqueue` publish step (K5, pkg/usecase/enqueue.go:15-73:
    object batches become Pub/Sub messages; here they become push
    envelopes). messageId = batch_id, so the SERVER's per-message gate
    and the INGEST's per-batch gate both dedup redeliveries; a
    non-200 response leaves the batch for re-publish (at-least-once,
    exactly-once effect).

    Returns [(batch_id, http_status)]."""
    import base64 as _b64
    import http.client as _http
    import json as _json

    out: list[tuple[str, int]] = []
    for b in batches:
        note = {"path": ",".join(b.paths)}
        env = {"message": {
            "messageId": b.batch_id,
            "data": _b64.b64encode(_json.dumps(note).encode()).decode(),
        }}
        conn = _http.HTTPConnection(host, port, timeout=timeout_sec)
        try:
            conn.request("POST", "/event/pubsub", body=_json.dumps(env),
                         headers=headers or {})
            out.append((b.batch_id, conn.getresponse().status))
        finally:
            conn.close()
    return out
