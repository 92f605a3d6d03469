"""Metadata-only COUNT pushdown (IcepackTable.count_where +
filestats.count_plan / _definitely_matches).

Contract: count_where(P) == read().filter(P).count() for every
predicate shape, with boundary-only residual scans on organized
tables — and strictly conservative proofs (NaN, nulls, truncated
strings, missing stats all fall back to scanning, never to a wrong
count)."""

import pyspark.sql.functions as F
import pytest

from swarm_spark import filestats
from swarm_spark.tablestore import IcepackCatalog


def _quartile_table(spark, tmp_path, n=4000):
    t = IcepackCatalog(str(tmp_path)).table("t")
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 13).alias("v"),
        F.concat(F.lit("u"), F.col("id")).alias("s"))
    q = n // 4
    for i in range(4):
        t.append(df.filter((F.col("id") >= i * q) & (F.col("id") < (i + 1) * q)))
    return t


class TestCountWhere:
    def test_range_count_is_metadata_plus_boundaries(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path)
        rep = t.count_where(spark, [("id", ">=", 500), ("id", "<", 3500)],
                            report=True)
        assert rep["count"] == 3000
        assert rep["meta_rows"] >= 2000     # the two middle quartiles
        assert rep["residual_files"] <= rep["files_total"] // 2
        # equality with the engine
        assert rep["count"] == t.read(spark).filter(
            (F.col("id") >= 500) & (F.col("id") < 3500)).count()

    def test_no_predicates_is_snapshot_count(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path, n=400)
        rep = t.count_where(spark, report=True)
        assert rep == {"count": 400, "meta_rows": 400,
                       "residual_files": 0, "mode": "snapshot"}

    def test_full_range_counts_all_from_metadata(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path, n=400)
        rep = t.count_where(spark, [("id", ">=", 0)], report=True)
        assert rep["count"] == 400 and rep["residual_files"] == 0

    def test_impossible_predicate_is_zero_metadata(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path, n=400)
        rep = t.count_where(spark, [("id", ">=", 10_000)], report=True)
        assert rep["count"] == 0 and rep["residual_files"] == 0

    def test_nulls_never_counted_and_block_proofs(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "id bigint, v bigint").coalesce(1))
        # v >= 0 would be all-match on values, but the NULL row fails
        # it: the file must be scanned, and the count excludes the null
        rep = t.count_where(spark, [("v", ">=", 0)], report=True)
        assert rep["count"] == 2 and rep["residual_files"] == 1

    def test_isnull_notnull(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(1, None), (2, None)], "id bigint, v string"))
        t.append(spark.createDataFrame(
            [(3, "x"), (4, "y")], "id bigint, v string"))
        assert t.count_where(spark, [("v", "isnull")]) == 2
        assert t.count_where(spark, [("v", "notnull")]) == 2
        rep = t.count_where(spark, [("v", "isnull")], report=True)
        assert rep["residual_files"] == 0  # both proofs are metadata

    def test_float_nan_semantics(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(1, 5.0), (2, 7.0), (3, float("nan"))],
            "id bigint, x double").coalesce(1))
        # Spark sorts NaN above everything: x > 1.0 matches ALL three
        # rows, and the metadata proof (mn=5.0 > 1.0, NaN-safe op) may
        # count the file without scanning
        got = t.count_where(spark, [("x", ">", 1.0)], report=True)
        assert got["count"] == 3 == t.read(spark).filter(F.col("x") > 1.0).count()
        assert got["residual_files"] == 0
        # x <= 7.0 must NOT be proven from bounds (invisible NaN fails
        # it): residual scan, exact result
        got = t.count_where(spark, [("x", "<=", 7.0)], report=True)
        assert got["count"] == 2 and got["residual_files"] == 1

    def test_mor_mask_falls_back_and_stays_exact(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path, n=400)
        t.delete_where(spark, [("id", "<", 50)], mode="mor")
        rep = t.count_where(spark, [("id", "<", 200)], report=True)
        assert rep["mode"] == "masked_fallback"
        assert rep["count"] == 150
        assert t.count_where(spark) == 350

    def test_conjunct_mix(self, spark, tmp_path):
        t = _quartile_table(spark, tmp_path, n=1000)
        preds = [("id", ">=", 100), ("id", "<", 900), ("v", "=", 3)]
        expect = t.read(spark).filter(
            (F.col("id") >= 100) & (F.col("id") < 900) & (F.col("v") == 3)
        ).count()
        assert t.count_where(spark, preds) == expect

    def test_definitely_matches_truncated_string_max(self):
        # truncated max is stored None — no upward proof possible
        entry = ["aaa", None, 0, "str"]
        assert not filestats._definitely_matches(entry, 10, "<=", "zzz")
        assert filestats._definitely_matches(entry, 10, ">=", "a")


class TestEvolvedSchema:
    def test_residual_scan_fills_missing_predicate_column(self, spark, tmp_path):
        """Every residual file may predate the predicate column: the
        residual read must fill NULL (read() semantics), not crash."""
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(1, "a"), (2, None)], "id bigint, v string").coalesce(1))
        t.append(spark.createDataFrame(
            [(3, "c", 30)], "id bigint, v string, extra bigint").coalesce(1))
        # old file: no `extra` stats → residual; nulls in v block
        # proofs too — exercise both paths
        assert t.count_where(spark, [("extra", "=", 30)]) == 1
        assert t.count_where(spark, [("extra", "isnull")]) == 2
        rep = t.count_where(spark, [("extra", ">", 0), ("v", "notnull")],
                            report=True)
        assert rep["count"] == 1
