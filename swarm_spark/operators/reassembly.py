"""Per-conversation reassembly with a bounded-memory guard.

Reassembly (`collect_list(struct(turn_idx, text))` per conv_id) is
conversation-bounded exactly like the ordering window — but a hash
aggregate builds each group's buffer BEFORE anything can inspect its
size, so one pathological conversation (a runaway agent loop with
millions of turns) would balloon a single executor's aggregation
buffer. Same failure family as dedup's hot LSH buckets, guarded the
same way: an explicit size gate with the policy chosen by the caller.

The guard costs one counts-only aggregation — the shuffle moves
(conv_id, n) pairs, metadata-sized next to the text shuffle the
reassembly itself performs. Measured corpus bound: max conversation =
99 turns at sf1 (1M events; SCALE.md "Reassembly bound"), so the
default max_turns=100_000 is three decades of headroom and only a
genuinely pathological stream trips it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class OversizeConversation(RuntimeError):
    """A conversation exceeds max_turns (reassembly would not be
    memory-bounded). Carries the offending conv ids/sizes (top few)."""


def reassemble_conversations(
    t: DataFrame,
    max_turns: int = 100_000,
    on_oversize: str = "raise",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, n_turns, conv_text) with turns concatenated in
    idx_col order. Ordering is explicit (sort_array over structs), so
    the operator is correct regardless of input layout.

    on_oversize — what to do with conversations longer than max_turns:
      'raise'    eager guard: run the counts-only aggregation now and
                 raise OversizeConversation naming the worst offenders
                 (the exactly-once batch pipeline's choice: fail loud
                 before any executor builds an unbounded buffer).
      'skip'     lazy plan: left-anti join oversize conversations out;
                 the job proceeds without them (triage mode — pair
                 with a separate query over the skipped ids).
      'truncate' lazy plan: keep each conversation's first max_turns
                 turns by idx_col (window row_number), then reassemble.
    """
    if on_oversize not in ("raise", "skip", "truncate"):
        raise ValueError(f"on_oversize={on_oversize!r}")

    sizes = t.groupBy(conv_col).agg(F.count(F.lit(1)).alias("_n"))
    over = sizes.filter(F.col("_n") > max_turns)

    if on_oversize == "raise":
        worst = over.orderBy(F.desc("_n")).limit(3).collect()
        if worst:
            detail = ", ".join(f"{r[conv_col]}={r['_n']}" for r in worst)
            raise OversizeConversation(
                f"conversation(s) exceed max_turns={max_turns}: {detail}; "
                "raise max_turns, or use on_oversize='skip'/'truncate'"
            )
    elif on_oversize == "skip":
        t = t.join(F.broadcast(over.select(conv_col)), conv_col, "left_anti")
    else:  # truncate
        from pyspark.sql import Window

        w = Window.partitionBy(conv_col).orderBy(idx_col)
        t = (
            t.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_turns)
            .drop("_rn")
        )

    ordered = F.sort_array(F.collect_list(F.struct(idx_col, text_col)))
    return t.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws(sep, F.transform(ordered, lambda s: s[text_col]))
        .alias("conv_text"),
    )
