"""Poll-based table subscription (streaming/follow.follow_changelog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.streaming.follow import follow_changelog
from swarm_spark.tablestore import IcepackCatalog, IncrementalReadError


@pytest.fixture()
def t(tmp_path):
    return IcepackCatalog(str(tmp_path)).table("t")


def _collector(seen):
    def process(df, from_sid, to_sid):
        seen.append((from_sid, to_sid,
                     None if df is None else
                     sorted((r["k"], r["_change_type"]) for r in df.collect())))
    return process


class TestFollow:
    def test_drains_and_resumes(self, spark, t, tmp_path):
        ck = str(tmp_path / "ck.json")
        t.append(spark.createDataFrame([(1,), (2,)], "k bigint"))
        seen: list = []
        rep = follow_changelog(spark, t, ck, _collector(seen))
        assert rep == {"batches": 1, "last_snapshot_id": 1}
        assert seen == [(None, 1, [(1, "insert"), (2, "insert")])]
        # caught up: no redelivery
        assert follow_changelog(spark, t, ck, _collector(seen))["batches"] == 0
        # new commits (append + mor erase) deliver incrementally
        t.append(spark.createDataFrame([(3,)], "k bigint"))
        t.delete_where(spark, [("k", "=", 1)], mode="mor")
        rep = follow_changelog(spark, t, ck, _collector(seen))
        assert rep["batches"] == 1 and rep["last_snapshot_id"] == 3
        assert seen[-1] == (1, 3, [(1, "delete"), (3, "insert")])

    def test_crash_before_checkpoint_redelivers(self, spark, t, tmp_path):
        """At-least-once: a process() that dies before the checkpoint
        advances sees the SAME batch again on restart."""
        ck = str(tmp_path / "ck.json")
        t.append(spark.createDataFrame([(1,)], "k bigint"))
        calls = {"n": 0}

        def boom(df, a, b):
            calls["n"] += 1
            raise RuntimeError("process crashed")

        with pytest.raises(RuntimeError, match="crashed"):
            follow_changelog(spark, t, ck, boom)
        seen: list = []
        follow_changelog(spark, t, ck, _collector(seen))
        assert calls["n"] == 1
        assert seen == [(None, 1, [(1, "insert")])]  # redelivered intact

    def test_rewrite_raise_and_reset(self, spark, t, tmp_path):
        ck = str(tmp_path / "ck.json")
        t.append(spark.createDataFrame([(1,)], "k bigint"))
        seen: list = []
        follow_changelog(spark, t, ck, _collector(seen))
        t.compact(spark)  # non-attributable rewrite crosses the checkpoint
        t.append(spark.createDataFrame([(2,)], "k bigint"))
        with pytest.raises(IncrementalReadError):
            follow_changelog(spark, t, ck, _collector(seen))
        rep = follow_changelog(spark, t, ck, _collector(seen),
                               on_rewrite="reset")
        assert rep["last_snapshot_id"] == 3
        assert seen[-1][2] is None  # df=None signals "full resync needed"
        # after the reset, incremental consumption resumes
        t.append(spark.createDataFrame([(9,)], "k bigint"))
        follow_changelog(spark, t, ck, _collector(seen))
        assert seen[-1] == (3, 4, [(9, "insert")])

    def test_max_batches_bounds_the_loop(self, spark, t, tmp_path):
        ck = str(tmp_path / "ck.json")
        t.append(spark.createDataFrame([(1,)], "k bigint"))
        rep = follow_changelog(spark, t, ck, lambda *a: None, max_batches=1,
                               stop_when_caught_up=False)
        assert rep["batches"] == 1
