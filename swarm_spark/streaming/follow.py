"""Subscribe to an icepack table's change feed — the
Delta/Iceberg-streaming-read analogue without a DataSource V2 source
(which Python cannot register in this container).

`follow_changelog` is a poll loop: each batch delivers
`read_changelog(last_checkpoint, CURRENT)` — insert rows from new
appends, delete (retraction) rows from merge-on-read erasure — to the
caller's `process(df, from_sid, to_sid)`, then advances a local
checkpoint file. Delivery is AT-LEAST-ONCE: a crash between process
and checkpoint redelivers the batch, so `process` must be idempotent
(keyed upserts, content-hash ids — normalize.py's deterministic id is
the standard trick). For exactly-once ADDITIVE aggregates use
incremental.refresh_agg instead — it rides the checkpoint on the
OUTPUT table's commit, which this generic consumer cannot do for
arbitrary side effects.

A copy-on-write rewrite crossing the checkpoint makes the diff
non-attributable (IncrementalReadError). The follower surfaces it via
`on_rewrite`: "raise" (default — the operator decides), or "reset"
(checkpoint jumps to CURRENT after calling
`process(None, from_sid, to_sid)` so the consumer can trigger its own
full resync).

Scale: bytes per poll ∝ changed dirs (the changelog scan's property);
the poll itself is two metadata reads when nothing changed.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession

from swarm_spark.tablestore import IncrementalReadError

__all__ = ["follow_changelog"]


def _read_ckpt(path: str) -> int | None:
    try:
        with open(path) as fh:
            return json.load(fh)["snapshot_id"]
    except (OSError, ValueError, KeyError):
        return None


def _write_ckpt(path: str, sid: int) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"snapshot_id": sid}, fh)
    os.replace(tmp, path)


def follow_changelog(
    spark: SparkSession,
    table,
    checkpoint_file: str,
    process,
    poll_interval_sec: float = 1.0,
    max_batches: int | None = None,
    stop_when_caught_up: bool = True,
    on_rewrite: str = "raise",
) -> dict:
    """Run the consumer loop; returns {"batches": n, "last_snapshot_id":
    sid}. stop_when_caught_up=True is the availableNow analogue (drain
    and return); False polls until max_batches deliveries."""
    if on_rewrite not in ("raise", "reset"):
        raise ValueError("on_rewrite must be 'raise' or 'reset'")
    batches = 0
    last = _read_ckpt(checkpoint_file)
    while True:
        cur = table.current_snapshot()
        cur_sid = cur["snapshot_id"] if cur else None
        if cur_sid is None or cur_sid == last:
            if stop_when_caught_up:
                return {"batches": batches, "last_snapshot_id": last}
            time.sleep(poll_interval_sec)
            continue
        try:
            ch = table.read_changelog(spark, last, cur_sid)
        except IncrementalReadError:
            if on_rewrite == "raise":
                raise
            process(None, last, cur_sid)  # consumer does its full resync
            _write_ckpt(checkpoint_file, cur_sid)
            last = cur_sid
            batches += 1
        else:
            process(ch, last, cur_sid)
            _write_ckpt(checkpoint_file, cur_sid)  # AFTER process: at-least-once
            last = cur_sid
            batches += 1
        if max_batches is not None and batches >= max_batches:
            return {"batches": batches, "last_snapshot_id": last}
