"""HTTP push serving path — the Pub/Sub push endpoint analogue.

Mirrors swarm's server semantics
(/root/reference/pkg/controller/server/server.go:112-165):

  POST /event/pubsub   Pub/Sub push envelope
                       {"message": {"messageId": ..., "data": b64}}
    * auth policy evaluated on (method, path, header, query)
      (auth.go:16-43) → 403 on deny
    * per-message exactly-once via the manifest (State.Acquired):
        completed          → 200, skip (ack: Pub/Sub stops redelivery)
        running, unexpired → WAIT for the owner, then 409
                             (≙ ErrBlockingPubSub — a non-2xx makes
                             Pub/Sub redeliver later)
        acquired           → decode base64 data, run the handler;
                             success → completed + 200,
                             failure → failed + 500 (redelivery retries)
  GET /health            liveness (also policy-gated, docs/rule.md:229)

The handler is pluggable (`handler(data: bytes, message_id: str)`);
`make_object_handler` wires the standard one: the decoded data is an
object notification {"path": ...} and the handler runs a JsonIngest
batch keyed by the message id — so the INGEST-level manifest provides
a second exactly-once gate around the actual table commits.

Spark-runtime note: the HTTP layer is intentionally thin (stdlib
ThreadingHTTPServer). Handlers submit work to the ONE driver
SparkSession — the same topology as swarm's single-process server
driving BigQuery; scale-out is adding executors, not HTTP replicas.
"""

from __future__ import annotations

import base64
import binascii
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .auth import AccessPolicy, authorize
from .manifest import STATE_COMPLETED, STATE_FAILED, ManifestStore


def make_object_handler(ingest):
    """data = JSON object notification {"path": <file or dir>}; run
    the open-JSON ingest exactly once per message id."""

    def handle(data: bytes, message_id: str) -> dict:
        note = json.loads(data)
        return ingest.run(note["path"], batch_id=f"pubsub-{message_id}")

    return handle


class IngestServer:
    def __init__(
        self,
        handler,
        manifest: ManifestStore,
        policy: AccessPolicy | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        wait_timeout_sec: float = 30.0,
    ):
        self.handler = handler
        self.manifest = manifest
        self.policy = policy
        self.wait_timeout_sec = wait_timeout_sec
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _respond(self, code: int, body: str):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _request_ctx(self) -> dict:
                from urllib.parse import parse_qs, urlparse

                u = urlparse(self.path)
                return {
                    "method": self.command,
                    "path": u.path,
                    "remote": self.client_address[0],
                    "query": parse_qs(u.query),
                    "header": {k: [v] for k, v in self.headers.items()},
                }

            def _authorized(self) -> bool:
                if authorize(outer.policy, self._request_ctx()):
                    return True
                self._respond(403, '{"error": "denied by policy"}')
                return False

            def do_GET(self):
                if not self._authorized():
                    return
                from urllib.parse import urlparse

                if urlparse(self.path).path == "/health":
                    self._respond(200, '{"status": "ok"}')
                else:
                    self._respond(404, '{"error": "not found"}')

            def do_POST(self):
                if not self._authorized():
                    return
                from urllib.parse import urlparse

                if urlparse(self.path).path != "/event/pubsub":
                    self._respond(404, '{"error": "not found"}')
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    msg = json.loads(self.rfile.read(n))["message"]
                    message_id = msg["messageId"]
                    data = base64.b64decode(msg["data"])
                except (KeyError, ValueError, TypeError, binascii.Error) as e:
                    self._respond(400, json.dumps({"error": str(e)}))
                    return
                outer._handle_message(self, message_id, data)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- message flow (server.go:112-165) ---------------------------
    def _handle_message(self, http, message_id: str, data: bytes) -> None:
        key = f"pubsub/{message_id}"
        state, acquired = self.manifest.get_or_create(key, message_id)
        if not acquired:
            if state.state == STATE_COMPLETED:
                http._respond(200, '{"status": "skipped (completed)"}')
                return
            # someone else owns it: wait, then tell Pub/Sub to retry
            self.manifest.wait(key, timeout_sec=self.wait_timeout_sec)
            http._respond(409, '{"error": "blocking: message in flight"}')
            return
        try:
            result = self.handler(data, message_id)
            self.manifest.update(key, STATE_COMPLETED)
            http._respond(200, json.dumps({"status": "ok",
                                           "result": _jsonable(result)}))
        except Exception as e:  # failed → redelivery retries
            self.manifest.update(key, STATE_FAILED)
            http._respond(500, json.dumps({"error": str(e)}))

    # -- lifecycle ----------------------------------------------------
    def start(self) -> "IngestServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        return str(v)
