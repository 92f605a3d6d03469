"""SCD Type 2 dimension maintenance (operators/scd2.py)."""

import pyspark.sql.functions as F
import pytest

from swarm_spark.operators.scd2 import (
    scd2_as_of, scd2_current, scd2_delta, scd2_upsert)
from swarm_spark.tablestore import IcepackCatalog

T1, T2, T3 = ("2024-01-01 00:00:00", "2024-02-01 00:00:00",
              "2024-03-01 00:00:00")


def _dim(spark, tmp_path):
    t = IcepackCatalog(str(tmp_path)).table("dim")
    init = spark.createDataFrame(
        [(1, "gold", 10), (2, "silver", 20), (3, None, 30)],
        "k bigint, tier string, score bigint")
    scd2_upsert(spark, t, init, keys=["k"], attrs=["tier", "score"], ts=T1)
    return t


class TestScd2:
    def test_change_closes_and_opens(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        upd = spark.createDataFrame([(1, "platinum", 10)],
                                    "k bigint, tier string, score bigint")
        scd2_upsert(spark, t, upd, keys=["k"], attrs=["tier", "score"], ts=T2)
        hist = {(r.k, r.tier, str(r._valid_from), str(r._valid_to))
                for r in t.read(spark).collect()}
        assert (1, "gold", f"{T1}", f"{T2}") in hist       # closed
        assert (1, "platinum", f"{T2}", "None") in hist    # opened
        assert (2, "silver", f"{T1}", "None") in hist      # untouched

    def test_unchanged_update_is_noop(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        before = sorted(map(tuple, t.read(spark).collect()))
        upd = spark.createDataFrame([(2, "silver", 20)],
                                    "k bigint, tier string, score bigint")
        snap = scd2_upsert(spark, t, upd, keys=["k"],
                           attrs=["tier", "score"], ts=T2)
        assert snap["rows_matched"] == 0 and snap["rows_inserted"] == 0
        assert sorted(map(tuple, t.read(spark).collect())) == before

    def test_null_attr_null_safe(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        # same NULL tier → unchanged (null-safe equality)
        upd = spark.createDataFrame([(3, None, 30)],
                                    "k bigint, tier string, score bigint")
        snap = scd2_upsert(spark, t, upd, keys=["k"],
                           attrs=["tier", "score"], ts=T2)
        assert snap["rows_matched"] == 0 and snap["rows_inserted"] == 0
        # NULL → value IS a change
        upd2 = spark.createDataFrame([(3, "bronze", 30)],
                                     "k bigint, tier string, score bigint")
        scd2_upsert(spark, t, upd2, keys=["k"],
                    attrs=["tier", "score"], ts=T2)
        cur = {r.k: r.tier for r in scd2_current(t.read(spark)).collect()}
        assert cur[3] == "bronze"

    def test_new_key_inserts_first_version(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        upd = spark.createDataFrame([(9, "new", 90)],
                                    "k bigint, tier string, score bigint")
        scd2_upsert(spark, t, upd, keys=["k"], attrs=["tier", "score"], ts=T2)
        rows = [r for r in t.read(spark).collect() if r.k == 9]
        assert len(rows) == 1 and rows[0]._valid_to is None

    def test_as_of_point_in_time(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        upd = spark.createDataFrame([(1, "platinum", 10)],
                                    "k bigint, tier string, score bigint")
        scd2_upsert(spark, t, upd, keys=["k"], attrs=["tier", "score"], ts=T2)
        h = t.read(spark)
        at_t1 = {r.k: r.tier for r in
                 scd2_as_of(h, "2024-01-15 00:00:00").collect()}
        at_t2 = {r.k: r.tier for r in
                 scd2_as_of(h, "2024-02-15 00:00:00").collect()}
        assert at_t1[1] == "gold" and at_t2[1] == "platinum"
        # exact boundary: the new version is valid AT its _valid_from
        at_edge = {r.k: r.tier for r in scd2_as_of(h, T2).collect()}
        assert at_edge[1] == "platinum"

    def test_three_batches_chain_versions(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        for ts, tier in ((T2, "a"), (T3, "b")):
            upd = spark.createDataFrame([(1, tier, 10)],
                                        "k bigint, tier string, score bigint")
            scd2_upsert(spark, t, upd, keys=["k"],
                        attrs=["tier", "score"], ts=ts)
        v = sorted((str(r._valid_from), str(r._valid_to or ""))
                   for r in t.read(spark).collect() if r.k == 1)
        assert v == [(T1, T2), (T2, T3), (T3, "")]
        # versions tile: every close equals the next open
        assert scd2_current(t.read(spark)).filter("k = 1").count() == 1

    def test_delta_is_pure_and_empty_for_empty_batch(self, spark, tmp_path):
        t = _dim(spark, tmp_path)
        empty = spark.createDataFrame([],
                                      "k bigint, tier string, score bigint")
        d = scd2_delta(t.read(spark), empty, ["k"], ["tier", "score"], T2)
        assert d.count() == 0
