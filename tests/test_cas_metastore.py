"""The icepack commit protocol on CONDITIONAL-PUT object-store
semantics (metastore.CASMetaStore) — the S3/GCS deployment seam.

Every scenario here is the same race/contention/adoption battery the
POSIX backend passes (tests/test_exactly_once.py,
tests/test_round3_fixes.py, tests/test_filestats.py DML), re-run with
a store that has NO flock, NO inodes, NO atomic rename — only
create-if-absent, replace-if-etag-match, and value-CAS on CURRENT.
A protocol correct against this store maps 1:1 onto real object
stores (SCALE.md §commit-protocol)."""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from swarm_spark.metastore import CASMetaStore
from swarm_spark.tablestore import (
    CommitConflict,
    IcepackCatalog,
    IcepackTable,
)


@pytest.fixture()
def cat(tmp_path):
    return IcepackCatalog(str(tmp_path), store_factory=CASMetaStore.for_dir)


def _table(cat, name) -> IcepackTable:
    return cat.table(name)


class TestStorePrimitives:
    def test_conditional_put_semantics(self):
        st = CASMetaStore()
        assert st._put_if_absent("k", "a")
        assert not st._put_if_absent("k", "b")  # exists → refused
        blob, etag = st._get("k")
        assert blob == "a"
        assert st._replace_if_match("k", "b", etag)
        assert not st._replace_if_match("k", "c", etag)  # stale etag
        assert st._get("k")[0] == "b"
        assert st._delete("k") and not st._delete("k")

    def test_value_cas_on_current(self):
        st = CASMetaStore()
        assert st.current_id() is None
        assert st._cas_current(None, 1)
        assert not st._cas_current(None, 2)  # no longer absent
        assert st._cas_current(1, 2)
        assert not st._cas_current(1, 3)  # stale expected
        assert st.current_id() == 2

    def test_adoption_race_exactly_one_winner(self):
        """Owner A claims; adopter B etag-replaces; whoever CASes
        CURRENT first commits THE PAYLOAD THEN IN THE CLAIM, and the
        other's verify sees a foreign token — never two commits, never
        zero."""
        st = CASMetaStore()
        st._cas_current(None, 1)
        pa = {"_writer": "A", "snapshot_id": 2}
        pb = {"_writer": "B", "snapshot_id": 2}
        assert st._put_if_absent("snap-2", json.dumps(pa))  # A claims
        _, etag = st._get("snap-2")
        assert st._replace_if_match("snap-2", json.dumps(pb), etag)  # B adopts
        # A advances FIRST — but the claim now carries B's payload
        assert st._cas_current(1, 2)
        committed = json.loads(st._get("snap-2")[0])
        assert committed["_writer"] == "B"  # A must verify → lost → rebase
        # B's CAS fails, but the closeout check sees ITS payload live
        assert not st._cas_current(1, 2)
        assert st.current_id() == 2


class TestCASCommitProtocol:
    def test_append_read_evolve(self, spark, cat):
        t = _table(cat, "basic")
        t.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))
        t.append(spark.createDataFrame([(2, "b", 1.5)],
                                       "k bigint, v string, x double"))
        got = {(r.k, r.v, r.x) for r in t.read(spark).collect()}
        assert got == {(1, "a", None), (2, "b", 1.5)}
        assert t.current_snapshot()["snapshot_id"] == 2

    def test_8_writer_race_no_lost_update(self, spark, cat):
        """The flagship race: 8 threads race appends through value-CAS
        commits; every append survives, ids distinct, no duplicated
        data dirs after rebases."""
        dfs = [spark.createDataFrame([(i, j) for j in range(10)], "w int, v int")
               for i in range(8)]

        def do(i):
            return _table(cat, "race").append(dfs[i])

        with ThreadPoolExecutor(max_workers=8) as pool:
            snaps = list(pool.map(do, range(8)))

        sids = sorted(s["snapshot_id"] for s in snaps)
        assert sids == list(range(1, 9))
        t = _table(cat, "race")
        cur = t.current_snapshot()
        assert cur["row_count"] == 80
        got = t.read(spark)
        assert got.count() == 80
        per_w = {r["w"]: r["n"] for r in
                 got.groupBy("w").agg(F.count("*").alias("n")).collect()}
        assert per_w == {i: 10 for i in range(8)}
        assert len(cur["data_dirs"]) == len(set(cur["data_dirs"])) == 8

    def test_stale_claim_adopted(self, spark, cat):
        """A dead writer's claim (older than the grace window, CURRENT
        never advanced) must not wedge the table — time-gated adoption
        via etag replace."""
        t = _table(cat, "orph")
        t.append(spark.createDataFrame([(1,)], "a int"))
        t.store.plant_claim(2, {"_writer": "dead", "parent": 1,
                                "op": "append", "data_dirs": []},
                            age_sec=60.0)
        snap = t.append(spark.createDataFrame([(2,)], "a int"))
        assert snap["snapshot_id"] == 2
        assert t.read(spark).count() == 2

    def test_fresh_claim_not_adopted(self, spark, cat):
        """A claim inside the grace window is presumed LIVE: the
        contender backs off to the contention error and the claim
        payload is untouched."""
        t = _table(cat, "live")
        t.append(spark.createDataFrame([(1,)], "a int"))
        t.store.plant_claim(2, {"_writer": "other-writer"})
        t.ADOPT_GRACE_SEC = 30.0
        with pytest.raises(RuntimeError, match="contention"):
            t.append(spark.createDataFrame([(2,)], "a int"))
        assert t.store.read_snap(2)["_writer"] == "other-writer"

    def test_conditional_append_require_parent_meta(self, spark, cat):
        t = _table(cat, "cond")
        t.append(spark.createDataFrame([(1,)], "a bigint"),
                 extra_meta={"ckpt": 10})
        t.append(spark.createDataFrame([(2,)], "a bigint"),
                 extra_meta={"ckpt": 11}, require_parent_meta={"ckpt": 10})
        with pytest.raises(CommitConflict):
            t.append(spark.createDataFrame([(3,)], "a bigint"),
                     require_parent_meta={"ckpt": 10})
        assert t.read(spark).count() == 2

    def test_rollback_and_time_travel(self, spark, cat):
        t = _table(cat, "rb")
        s1 = t.append(spark.createDataFrame([(1,)], "a int"))
        s2 = t.append(spark.createDataFrame([(2,)], "a int"))
        assert t.read(spark, snapshot_id=s1["snapshot_id"]).count() == 1
        assert t.rollback(s2["snapshot_id"]) is True
        assert t.current_snapshot()["snapshot_id"] == s1["snapshot_id"]
        assert t.rollback(99) is False

    def test_expire_snapshots(self, spark, cat):
        t = _table(cat, "exp")
        for i in range(4):
            t.append(spark.createDataFrame([(i,)], "a int"))
        rep = t.expire_snapshots(keep_last=2)
        assert rep["expired"] == 2
        assert [s["snapshot_id"] for s in t.snapshots()] == [3, 4]
        assert t.read(spark).count() == 4  # cumulative dirs intact

    def test_delete_retries_past_concurrent_append(self, spark, cat, tmp_path):
        """Mid-rewrite append injection: the DELETE's stale-parent
        commit is refused by the value-CAS (op='delete' conflicts, not
        rebases), and the internal retry recomputes from the new
        CURRENT — the concurrent row is seen and NOT deleted."""
        t = _table(cat, "dml")
        t.append(spark.createDataFrame([(i,) for i in range(5)], "a bigint"))
        other = _table(cat, "dml")
        real_write = t._write_data
        state = {"injected": False}

        def write_then_append(df, unit, ts_col, **kw):
            out = real_write(df, unit, ts_col, **kw)
            if not state["injected"]:
                state["injected"] = True
                other.append(spark.createDataFrame([(99,)], "a bigint"))
            return out

        t._write_data = write_then_append
        snap = t.delete_where(spark, [("a", "<", 3)])
        t._write_data = real_write
        assert state["injected"]
        assert snap["rows_deleted"] == 3
        got = sorted(r["a"] for r in t.read(spark).collect())
        assert got == [3, 4, 99]  # delete applied, concurrent row survived

    def test_gc_vs_appenders_race(self, spark, cat):
        """Appenders racing compact+expire maintenance: no kept
        snapshot references a deleted dir, no appended row lost."""
        import os as _os

        _table(cat, "gcr").append(spark.createDataFrame([(-1,)], "a bigint"))
        errors: list = []
        n_writers, n_appends = 3, 3

        def appender(w: int):
            try:
                t = _table(cat, "gcr")
                for i in range(n_appends):
                    t.append(spark.createDataFrame([(w * 100 + i,)], "a bigint"))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def maintainer():
            try:
                t = _table(cat, "gcr")
                for _ in range(3):
                    try:
                        t.compact(spark)
                    except CommitConflict:
                        pass  # acceptable under contention
                    t.expire_snapshots(keep_last=2)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=appender, args=(w,))
                   for w in range(n_writers)]
        threads.append(threading.Thread(target=maintainer))
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert errors == []
        t = _table(cat, "gcr")
        for s in t.snapshots():  # every kept snapshot fully readable
            for d in s["data_dirs"]:
                assert _os.path.isdir(d)
        got = sorted(r["a"] for r in t.read(spark).collect())
        want = sorted([-1] + [w * 100 + i
                              for w in range(n_writers)
                              for i in range(n_appends)])
        assert got == want

    def test_same_store_shared_across_handles(self, cat, tmp_path, spark):
        """for_dir returns ONE store per metadata path — two table
        handles see each other's commits instantly (bucket semantics)."""
        t1 = _table(cat, "shared")
        t2 = _table(cat, "shared")
        assert t1.store is t2.store
        t1.append(spark.createDataFrame([(1,)], "a int"))
        assert t2.current_snapshot()["snapshot_id"] == 1

    def test_tags_on_cas_store(self, spark, cat):
        t = _table(cat, "tags")
        t.append(spark.createDataFrame([(1,)], "a bigint"))
        t.create_tag("v1")
        t.append(spark.createDataFrame([(2,)], "a bigint"))
        t.expire_snapshots(keep_last=1)
        assert t.read(spark, tag="v1").count() == 1
        assert _table(cat, "tags").tags() == {"v1": 1}

    def test_wap_on_cas_store(self, spark, cat):
        """stage→audit→publish runs unchanged on conditional-put
        commits (publish is an adopt through the same protocol)."""
        from swarm_spark.wap import AuditFailed, write_audit_publish

        t = _table(cat, "wap")
        snap = write_audit_publish(
            spark, t, spark.createDataFrame([(1, "a")], "id bigint, cat string"),
            [("not_null", "id")])
        assert snap["added_rows"] == 1 and all(
            r["passed"] for r in snap["audit"])
        with pytest.raises(AuditFailed):
            write_audit_publish(
                spark, t,
                spark.createDataFrame([(None, "b")], "id bigint, cat string"),
                [("not_null", "id")])
        assert t.read(spark).count() == 1

    def test_delete_keys_on_cas_store(self, spark, cat):
        t = _table(cat, "ek")
        t.append(spark.createDataFrame(
            [(1, "u1"), (2, "u2"), (3, "u1")], "k bigint, user string"))
        t.delete_keys(spark, spark.createDataFrame([("u1",)], "user string"),
                      ["user"])
        assert sorted(r["k"] for r in t.read(spark).collect()) == [2]
        t.compact(spark)
        assert _table(cat, "ek").current_snapshot().get("deletes") == []
        assert t.read(spark).count() == 1
