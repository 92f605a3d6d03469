"""Round-5 advisory fixes, each pinned by the failure it closes:

1. read_incremental: checkpoint snapshot expired at the keep_last
   BOUNDARY (every later snapshot live) must raise IncrementalReadError
   — not FileNotFoundError — so refresh_agg's fallback fires.
2. filestats: a NaN predicate literal must never prune (Spark's NaN
   semantics disagree with both Python comparisons and parquet
   min/max), preserving read(prune=P) == read().filter(P).
3. orphan GC ages a dir by the NEWEST mtime in its whole tree — a
   long-running in-flight writer that last touched only a nested file
   is never collected.
4. Conditional commits (require_parent_meta): two concurrent
   refresh_agg calls that both read checkpoint X cannot both land the
   same delta (no double counting).
"""

from __future__ import annotations

import math
import os
import time

import pytest

from swarm_spark.incremental import _CKPT_KEY, read_agg, refresh_agg
from swarm_spark.tablestore import (
    CommitConflict,
    IcepackCatalog,
    IncrementalReadError,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestExpiredCheckpointBoundary:
    def test_boundary_expiry_raises_incremental_error(self, spark, tmp_path):
        """checkpoint == newest EXPIRED snapshot, all later snapshots
        live: changes_between succeeds (the walk stops at the
        checkpoint id without reading it), but the base-dir lookup
        must surface IncrementalReadError, not FileNotFoundError."""
        t = IcepackCatalog(str(tmp_path)).table("t")
        s1 = t.append(spark.createDataFrame([(1,)], "a bigint"))
        t.append(spark.createDataFrame([(2,)], "a bigint"))
        t.append(spark.createDataFrame([(3,)], "a bigint"))
        t.expire_snapshots(keep_last=2)  # s1 gone; s2, s3 LIVE
        # the walk itself is fine — only the base lookup fails
        assert len(t.changes_between(s1["snapshot_id"])) == 2
        with pytest.raises(IncrementalReadError):
            t.read_incremental(spark, s1["snapshot_id"])

    def test_refresh_agg_falls_back_to_full(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame([("a", 1)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"])
        src.append(spark.createDataFrame([("b", 2)], "k string, v bigint"))
        src.append(spark.createDataFrame([("c", 3)], "k string, v bigint"))
        src.expire_snapshots(keep_last=2)  # checkpoint gone, later snaps live
        r = refresh_agg(spark, src, dst, ["k"])
        assert r["mode"] == "full"
        assert _rows(read_agg(spark, dst, ["k"]), "k", "n") == \
            [("a", 1), ("b", 1), ("c", 1)]


class TestNaNLiteralNeverPrunes:
    @pytest.mark.parametrize("op", ["=", "<", "<=", ">", ">="])
    def test_nan_literal_scans_all_files(self, spark, tmp_path, op):
        """prune=[(x, op, NaN)] must keep every file: a NaN-free
        stats range would 'exclude' NaN under Python comparisons even
        for files that DO contain matching NaN rows."""
        t = IcepackCatalog(str(tmp_path)).table(f"t_{op.replace('=', 'e').replace('<', 'l').replace('>', 'g')}")
        t.append(spark.createDataFrame([(1, 1.0)], "k int, x double").coalesce(1))
        t.append(spark.createDataFrame(
            [(2, float("nan"))], "k int, x double").coalesce(1))
        rep = t.prune_report([("x", op, float("nan"))])
        assert rep["files_kept"] == rep["files_total"] == 2
        # engine-semantics equivalence: read(prune) == read().filter
        pruned = t.read(spark, prune=[("x", op, float("nan"))])
        full = t.read(spark).filter(f"x {('==' if op == '=' else op)} double('nan')")
        assert _rows(pruned, "k") == _rows(full, "k")
        if op in ("=", ">=", "<="):  # NaN==NaN true; NaN sorts above all
            # the NaN row matches → this is the row pruning would have lost
            assert (2,) in _rows(pruned, "k")
            assert any(math.isnan(r["x"]) for r in pruned.collect())

    def test_nan_in_in_list(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t_in")
        t.append(spark.createDataFrame([(1, 1.0)], "k int, x double").coalesce(1))
        t.append(spark.createDataFrame(
            [(2, float("nan"))], "k int, x double").coalesce(1))
        rep = t.prune_report([("x", "in", [float("nan")])])
        assert rep["files_kept"] == 2  # never prune on a NaN element
        # a non-NaN in-list still prunes the NaN-only file
        assert t.prune_report([("x", "in", [1.0])])["files_kept"] == 1


class TestOrphanGCTreeMtime:
    def test_fresh_nested_file_keeps_dir_alive(self, spark, tmp_path):
        """Partitioned writes touch only SUBDIRS after the initial
        mkdir: an old top-level mtime with a fresh nested file means
        an in-flight writer — never collect it."""
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame([(1,)], "a bigint"))
        d = os.path.join(t.data, "_s=inflight0")
        sub = os.path.join(d, "_p=2024010100")
        os.makedirs(sub)
        old = time.time() - 7200
        with open(os.path.join(sub, "part-0.parquet"), "w") as fh:
            fh.write("x")  # FRESH — writer still making progress
        os.utime(d, (old, old))
        os.utime(sub, (old, old))
        rep = t.remove_orphan_files(older_than_sec=3600)
        assert rep == {"orphans_removed": 0, "orphans_too_young": 1}
        assert os.path.isdir(d)
        # once the whole tree is old, it goes
        os.utime(os.path.join(sub, "part-0.parquet"), (old, old))
        os.utime(sub, (old, old))
        os.utime(d, (old, old))
        rep = t.remove_orphan_files(older_than_sec=3600)
        assert rep["orphans_removed"] == 1
        assert not os.path.isdir(d)


class TestConditionalCommit:
    def test_require_parent_meta_conflicts(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame([(1,)], "a bigint"),
                 extra_meta={"ckpt": 10})
        # matching requirement commits
        t.append(spark.createDataFrame([(2,)], "a bigint"),
                 extra_meta={"ckpt": 11}, require_parent_meta={"ckpt": 10})
        # stale requirement conflicts and leaves no data behind
        before = t.read(spark).count()
        with pytest.raises(CommitConflict):
            t.append(spark.createDataFrame([(3,)], "a bigint"),
                     extra_meta={"ckpt": 11},
                     require_parent_meta={"ckpt": 10})
        assert t.read(spark).count() == before
        assert t.remove_orphan_files(older_than_sec=0)["orphans_removed"] == 0

    def test_require_parent_meta_absent_key_is_none(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame([(1,)], "a bigint"))
        # absent key reads as None: requiring None passes…
        t.append(spark.createDataFrame([(2,)], "a bigint"),
                 require_parent_meta={"ckpt": None})
        # …requiring a value fails
        with pytest.raises(CommitConflict):
            t.append(spark.createDataFrame([(3,)], "a bigint"),
                     require_parent_meta={"ckpt": 5})

    def test_concurrent_refreshers_never_double_count(self, spark, tmp_path):
        """Deterministic re-enactment of the race: refresher B commits
        the delta for checkpoint X→Y while refresher A (which also
        read checkpoint X) is still computing. A's conditional append
        must conflict; the public refresh_agg retry then lands a NOOP
        (nothing new), so the rollup counts each fact exactly once."""
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame([("a", 1)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"])           # checkpoint = s1
        ckpt_a = dst.current_snapshot()[_CKPT_KEY]
        s2 = src.append(spark.createDataFrame([("b", 2)], "k string, v bigint"))

        # refresher B wins: lands s1→s2 delta, advancing the checkpoint
        inc = src.read_incremental(spark, ckpt_a, s2["snapshot_id"])
        from swarm_spark.incremental import _partial_agg
        dst.append(_partial_agg(inc, ["k"], {}),
                   extra_meta={_CKPT_KEY: s2["snapshot_id"]},
                   require_parent_meta={_CKPT_KEY: ckpt_a})

        # refresher A, still holding checkpoint ckpt_a, tries the SAME delta
        with pytest.raises(CommitConflict):
            dst.append(_partial_agg(inc, ["k"], {}),
                       extra_meta={_CKPT_KEY: s2["snapshot_id"]},
                       require_parent_meta={_CKPT_KEY: ckpt_a})

        # the public API recovers: retry re-reads the checkpoint → noop
        r = refresh_agg(spark, src, dst, ["k"])
        assert r["mode"] == "noop"
        assert _rows(read_agg(spark, dst, ["k"]), "k", "n") == \
            [("a", 1), ("b", 1)]  # each fact counted exactly once
