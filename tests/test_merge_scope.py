"""Dir-scoped copy-on-write MERGE (tablestore.merge_upsert).

The upgrade under test: an upsert batch rewrites ONLY the data dirs
whose file stats admit a row matching an incoming key — every other
dir carries into the new snapshot untouched (byte-identical path).
Two scoping stages: per-key [min,max] range (any type), then exact
sorted-key bisect for a single int/str key (sparse keys prune dirs a
range straddles). Semantics must stay exactly the anti-join + union
of the pre-scoped implementation, including NULL keys, schema
evolution across untouched dirs, and merge-on-read mask folding.
"""

import pyspark.sql.functions as F
import pytest

from swarm_spark.tablestore import IcepackCatalog


def _table(tmp_path, name="t"):
    return IcepackCatalog(str(tmp_path)).table(name)


def _append_ranges(spark, t, ranges, extra_cols=""):
    """One append (= one data dir) per [lo, hi) id range."""
    for lo, hi in ranges:
        df = spark.range(lo, hi).select(
            F.col("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        t.append(df)


class TestDirScoping:
    def test_untouched_quartiles_carry_byte_identical(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 100), (100, 200), (200, 300), (300, 400)])
        before_dirs = list(t.current_snapshot()["data_dirs"])
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(150, "NEW150"), (999, "NEW999")],
                                  "id bigint, v string"),
            keys=["id"],
        )
        assert snap["dirs_rewritten"] == 1
        assert snap["dirs_untouched"] == 3
        # untouched dirs carry as the SAME paths — no data movement
        assert set(before_dirs) - set(snap["data_dirs"]) == {before_dirs[1]}
        assert set(snap["data_dirs"]) >= set(before_dirs) - {before_dirs[1]}
        got = {r.id: r.v for r in t.read(spark).collect()}
        assert got[150] == "NEW150" and got[999] == "NEW999"
        assert got[0] == "v0" and got[399] == "v399" and len(got) == 401
        assert snap["rows_matched"] == 1 and snap["rows_inserted"] == 1
        assert snap["row_count"] == 401 == t.read(spark).count()

    def test_sparse_keys_bisect_past_a_straddled_dir(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 100), (100, 200), (200, 300)])
        # range [50, 250] straddles the middle dir; the exact key set
        # {50, 250} does not touch it — bisect must prune it
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(50, "A"), (250, "B")], "id bigint, v string"),
            keys=["id"],
        )
        assert snap["dirs_rewritten"] == 2
        assert snap["dirs_untouched"] == 1
        got = {r.id: r.v for r in t.read(spark).collect()}
        assert got[50] == "A" and got[250] == "B" and got[150] == "v150"
        assert len(got) == 300

    def test_keys_cap_falls_back_to_range(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 100), (100, 200), (200, 300)])
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(50, "A"), (250, "B")], "id bigint, v string"),
            keys=["id"],
            keys_cap=1,  # force the range-only path
        )
        assert snap["dirs_rewritten"] == 3  # range [50,250] hits all
        got = {r.id: r.v for r in t.read(spark).collect()}
        assert got[50] == "A" and got[250] == "B" and got[150] == "v150"
        assert len(got) == 300

    def test_string_keys_bisect(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append(spark.createDataFrame(
            [("aaa", 1), ("abc", 2)], "k string, n bigint"))
        t.append(spark.createDataFrame(
            [("mmm", 3), ("mzz", 4)], "k string, n bigint"))
        t.append(spark.createDataFrame(
            [("zaa", 5), ("zzz", 6)], "k string, n bigint"))
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([("abc", 20), ("zzz", 60)], "k string, n bigint"),
            keys=["k"],
        )
        assert snap["dirs_rewritten"] == 2 and snap["dirs_untouched"] == 1
        got = {r.k: r.n for r in t.read(spark).collect()}
        assert got == {"aaa": 1, "abc": 20, "mmm": 3, "mzz": 4,
                       "zaa": 5, "zzz": 60}

    def test_composite_keys_use_range_scoping(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append(spark.createDataFrame(
            [("a", 1, "x"), ("a", 2, "y")], "k string, n bigint, v string"))
        t.append(spark.createDataFrame(
            [("q", 1, "qx"), ("q", 2, "qy")], "k string, n bigint, v string"))
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([("a", 2, "Y2")], "k string, n bigint, v string"),
            keys=["k", "n"],
        )
        # per-column ranges k∈[a,a], n∈[2,2] exclude the q-dir
        assert snap["dirs_rewritten"] == 1 and snap["dirs_untouched"] == 1
        got = {(r.k, r.n): r.v for r in t.read(spark).collect()}
        assert got == {("a", 1): "x", ("a", 2): "Y2",
                       ("q", 1): "qx", ("q", 2): "qy"}


class TestSemantics:
    def test_null_keys_insert_and_match_nothing(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append(spark.createDataFrame(
            [(1, "a"), (None, "cur-null")], "id bigint, v string"))
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(None, "new-null"), (1, "A")],
                                  "id bigint, v string"),
            keys=["id"],
        )
        rows = sorted((r.id, r.v) for r in t.read(spark).collect()
                      if r.id is not None)
        nulls = sorted(r.v for r in t.read(spark).collect() if r.id is None)
        assert rows == [(1, "A")]
        assert nulls == ["cur-null", "new-null"]  # null ≠ null: both live
        assert snap["rows_matched"] == 1 and snap["rows_inserted"] == 1

    def test_all_null_keyset_is_pure_insert_zero_rewrites(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 10)])
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(None, "n1")], "id bigint, v string"),
            keys=["id"],
        )
        assert snap["dirs_rewritten"] == 0 and snap["dirs_untouched"] == 1
        assert t.read(spark).count() == 11

    def test_schema_evolution_fills_untouched_dirs_with_null(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 10), (100, 110)])
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(105, "B", 7)],
                                  "id bigint, v string, extra bigint"),
            keys=["id"],
        )
        assert snap["dirs_untouched"] == 1  # the [0,10) dir never rewritten
        got = {r.id: (r.v, r.extra) for r in t.read(spark).collect()}
        assert got[105] == ("B", 7)
        assert got[0] == ("v0", None)  # evolved schema over an old dir

    def test_mor_mask_folds_into_rewrite_not_resurrected(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 10), (100, 110)])
        t.delete_where(spark, [("id", "=", 3)], mode="mor")
        snap = t.merge_upsert(
            spark,
            spark.createDataFrame([(5, "FIVE")], "id bigint, v string"),
            keys=["id"],
        )
        assert snap["dirs_rewritten"] == 1
        ids = {r.id for r in t.read(spark).collect()}
        assert 3 not in ids and 5 in ids and len(ids) == 19
        # the rewritten dir's mask was folded; nothing re-scopes to it
        for ent in t.current_snapshot().get("deletes") or []:
            svals = {t._dir_sval(d) for d in snap["data_dirs"]}
            assert set(ent["applies_to"]) <= svals

    def test_mor_mask_on_untouched_dir_carries_narrowed(self, spark, tmp_path):
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 10), (100, 110)])
        t.delete_where(spark, [("id", "=", 3)], mode="mor")
        t.merge_upsert(
            spark,
            spark.createDataFrame([(105, "X")], "id bigint, v string"),
            keys=["id"],
        )
        ids = {r.id for r in t.read(spark).collect()}
        assert 3 not in ids and len(ids) == 19  # mask still applies

    def test_scoped_equals_unscoped_recompute(self, spark, tmp_path):
        """A/B: the dir-scoped merge's table content equals the plain
        anti-join + union recomputed over the pre-merge snapshot."""
        t = _table(tmp_path)
        _append_ranges(spark, t, [(0, 50), (50, 100), (100, 150)])
        pre = t.read(spark)
        inc = spark.createDataFrame(
            [(10, "u10"), (60, "u60"), (500, "i500")], "id bigint, v string")
        expect = sorted(
            (r.id, r.v)
            for r in pre.join(inc.select("id"), ["id"], "left_anti")
                        .unionByName(inc).collect()
        )
        t.merge_upsert(spark, inc, keys=["id"])
        got = sorted((r.id, r.v) for r in t.read(spark).collect())
        assert got == expect
