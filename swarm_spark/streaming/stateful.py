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
counters — a running conversation health feed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_total bigint, errors_total bigint, "
    "tool_calls_total bigint, max_turn_idx int"
)
STATE_SCHEMA = "turns bigint, errors bigint, calls bigint, max_idx int"


def _update(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    turns, errors, calls, max_idx = (
        state.get if state.exists else (0, 0, 0, -1)
    )
    for pdf in pdf_iter:
        turns += len(pdf)
        errors += int(pdf["text"].str.contains("ERR-[0-9]{4}", regex=True).sum())
        calls += int(pdf["text"].str.contains("CALL tool=", regex=False).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((turns, errors, calls, max_idx))
    yield pd.DataFrame(
        [{
            "conv_id": conv_id, "turns_total": turns, "errors_total": errors,
            "tool_calls_total": calls, "max_turn_idx": max_idx,
        }]
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Streaming DF of cumulative per-conversation counters. State
    lives in the checkpointed state store — a restart resumes counts
    exactly (the streaming analogue of the manifest's resumability)."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
