"""Bounded-memory reassembly guard (r3 verdict #7)."""

from __future__ import annotations

import pytest

from swarm_spark.operators.reassembly import (
    OversizeConversation,
    reassemble_conversations,
)


@pytest.fixture(scope="module")
def t(spark):
    rows = [("c1", i, f"t1-{i}") for i in range(5)]
    rows += [("c2", i, f"t2-{i}") for i in range(12)]
    # shuffle input order: correctness must not depend on layout
    rows = rows[::-1]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_reassembles_in_turn_order(spark, t):
    out = {r.conv_id: r for r in reassemble_conversations(t).collect()}
    assert out["c1"].n_turns == 5
    assert out["c1"].conv_text == "\n".join(f"t1-{i}" for i in range(5))
    assert out["c2"].conv_text.startswith("t2-0\nt2-1")


def test_raise_mode_names_offenders(spark, t):
    with pytest.raises(OversizeConversation, match="c2=12"):
        reassemble_conversations(t, max_turns=10, on_oversize="raise")


def test_skip_mode_drops_oversize_only(spark, t):
    out = {r.conv_id: r for r in
           reassemble_conversations(t, max_turns=10, on_oversize="skip").collect()}
    assert set(out) == {"c1"} and out["c1"].n_turns == 5


def test_truncate_mode_keeps_prefix(spark, t):
    out = {r.conv_id: r for r in
           reassemble_conversations(t, max_turns=3, on_oversize="truncate").collect()}
    assert out["c2"].n_turns == 3
    assert out["c2"].conv_text == "t2-0\nt2-1\nt2-2"
    assert out["c1"].n_turns == 3  # truncation applies uniformly


def test_guard_under_limit_is_noop(spark, t):
    a = reassemble_conversations(t, max_turns=100).collect()
    b = reassemble_conversations(t, max_turns=12, on_oversize="skip").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
