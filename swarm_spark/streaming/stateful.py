"""Custom stateful streaming operator: per-conversation progress
tracking with applyInPandasWithState.

swarm keeps per-message processing state in Firestore
(/root/reference/pkg/domain/model/state.go); the streaming rebuild
additionally needs PER-CONVERSATION state that survives micro-batches
(how many turns seen, last turn index, error totals) — the kind of
custom stateful operator Structured Streaming expresses with
applyInPandasWithState (Arrow-batched per group, state in the
streaming state store, checkpointed with the query).

Output: one row per (conv_id, micro-batch touch) with cumulative
counters — a running conversation health feed. `closed` marks the
final row of a conversation GC'd by the event-time idle timeout.

State GC (the 100 TB concern): without a timeout the state store
grows one entry per conversation forever. With `idle_timeout`
(requires a watermark on the input), a conversation idle past the
watermark by that margin emits one final `closed=true` row and its
state is REMOVED — bounded state, mirroring swarm's state TTL
(usecase.go:39-42 / state.go expiry).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_total bigint, errors_total bigint, "
    "tool_calls_total bigint, max_turn_idx int, closed boolean"
)
STATE_SCHEMA = "turns bigint, errors bigint, calls bigint, max_idx int"


def _make_update(idle_timeout_ms: int | None):
    def _update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            turns, errors, calls, max_idx = state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id, "turns_total": turns,
                "errors_total": errors, "tool_calls_total": calls,
                "max_turn_idx": max_idx, "closed": True,
            }])
            return
        turns, errors, calls, max_idx = (
            state.get if state.exists else (0, 0, 0, -1)
        )
        last_event_ms = 0
        for pdf in pdf_iter:
            turns += len(pdf)
            errors += int(pdf["text"].str.contains("ERR-[0-9]{4}", regex=True).sum())
            calls += int(pdf["text"].str.contains("CALL tool=", regex=False).sum())
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
                if "ts" in pdf.columns:
                    last_event_ms = max(
                        last_event_ms, int(pdf["ts"].max().timestamp() * 1000)
                    )
        state.update((turns, errors, calls, max_idx))
        if idle_timeout_ms is not None:
            # event-time GC anchored at LAST ACTIVITY (not the
            # watermark): fire once the watermark passes
            # max(last event, watermark) + idle_timeout — a
            # conversation whose events run ahead of the watermark
            # stays open
            anchor = max(state.getCurrentWatermarkMs(), last_event_ms)
            state.setTimeoutTimestamp(anchor + idle_timeout_ms)
        yield pd.DataFrame([{
            "conv_id": conv_id, "turns_total": turns, "errors_total": errors,
            "tool_calls_total": calls, "max_turn_idx": max_idx,
            "closed": False,
        }])

    return _update


def conversation_progress(
    stream: DataFrame, idle_timeout_minutes: int | None = None
) -> DataFrame:
    """Streaming DF of cumulative per-conversation counters. State
    lives in the checkpointed state store — a restart resumes counts
    exactly (the streaming analogue of the manifest's resumability).
    idle_timeout_minutes enables event-time state GC (the input stream
    must carry a watermark)."""
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    cols = ["conv_id", "turn_idx", "text"]
    if idle_timeout_minutes is not None:
        cols.append("ts")  # the watermark column must survive the projection
    return (
        stream.select(*cols)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(
                idle_timeout_minutes * 60_000
                if idle_timeout_minutes is not None else None
            ),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
