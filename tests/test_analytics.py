"""Funnel conversion + cohort retention (operators/analytics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.operators.analytics import cohort_retention, funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, event_type string, ts_s string") \
        .select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))


class TestFunnel:
    def test_strict_order_required(self, spark):
        rows = [
            # u1 completes in order
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 01:00:00"),
            (1, "buy", "2024-01-01 02:00:00"),
            # u2 clicks BEFORE viewing: reaches view only
            (2, "click", "2024-01-01 00:00:00"),
            (2, "view", "2024-01-01 01:00:00"),
            (2, "buy", "2024-01-02 00:00:00"),
            # u3 never buys
            (3, "view", "2024-01-01 00:00:00"),
            (3, "click", "2024-01-01 00:30:00"),
            # u4 has no view at all
            (4, "buy", "2024-01-01 00:00:00"),
        ]
        out = {r["step"]: r["n_entities"]
               for r in funnel_counts(_ev(spark, rows), ["view", "click", "buy"]).collect()}
        assert out == {"view": 3, "click": 2, "buy": 1}

    def test_equal_timestamps_do_not_advance(self, spark):
        rows = [(1, "view", "2024-01-01 00:00:00"),
                (1, "click", "2024-01-01 00:00:00")]
        out = {r["step"]: r["n_entities"]
               for r in funnel_counts(_ev(spark, rows), ["view", "click"]).collect()}
        assert out == {"view": 1, "click": 0}

    def test_single_step_rejected(self, spark):
        with pytest.raises(ValueError):
            funnel_counts(_ev(spark, []), ["view"])


class TestCohortRetention:
    def test_weekly_offsets(self, spark):
        rows = [
            # u1 first seen week of 2024-01-01 (Mon), active wk0 and wk2
            (1, "view", "2024-01-02 10:00:00"),
            (1, "view", "2024-01-16 10:00:00"),
            # u2 same cohort, active wk0 only (two events, one period)
            (2, "view", "2024-01-03 10:00:00"),
            (2, "view", "2024-01-04 10:00:00"),
            # u3 cohort wk of 2024-01-08, active wk0 and wk1
            (3, "view", "2024-01-09 10:00:00"),
            (3, "view", "2024-01-15 10:00:00"),
        ]
        out = {(str(r["cohort"]), r["period_offset"]): r["n_entities"]
               for r in cohort_retention(_ev(spark, rows), period="week").collect()}
        assert out == {
            ("2024-01-01 00:00:00", 0): 2,
            ("2024-01-01 00:00:00", 2): 1,
            ("2024-01-08 00:00:00", 0): 1,
            ("2024-01-08 00:00:00", 1): 1,
        }

    def test_daily_period(self, spark):
        rows = [(1, "view", "2024-01-01 09:00:00"),
                (1, "view", "2024-01-03 23:00:00")]
        out = {r["period_offset"]: r["n_entities"]
               for r in cohort_retention(_ev(spark, rows), period="day").collect()}
        assert out == {0: 1, 2: 1}


class TestProfileTable:
    def test_exact_fields_and_null_counts(self, spark):
        from swarm_spark.operators.analytics import profile_table

        df = spark.createDataFrame(
            [(1, "a", None), (2, None, 5.5), (3, "c", -1.0), (4, "a", None)],
            "id bigint, s string, v double")
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["id"]["n"] == 4 and prof["id"]["n_null"] == 0
        assert prof["s"]["n_null"] == 1
        assert prof["v"]["n_null"] == 2
        # native-type ordering: -1.0 < 5.5 numerically
        assert prof["v"]["min_s"] == "-1.0" and prof["v"]["max_s"] == "5.5"
        assert prof["id"]["min_s"] == "1" and prof["id"]["max_s"] == "4"
        assert prof["s"]["dtype"] == "string"

    def test_approx_distinct_within_tolerance(self, spark):
        from swarm_spark.operators.analytics import profile_table

        df = spark.range(10000).selectExpr("id", "id % 137 AS m")
        prof = {r["column"]: r for r in profile_table(df, approx_rsd=0.02).collect()}
        assert abs(prof["m"]["approx_distinct"] - 137) <= 137 * 0.1
        assert abs(prof["id"]["approx_distinct"] - 10000) <= 10000 * 0.1

    def test_single_scan_plan(self, spark):
        from swarm_spark.operators.analytics import profile_table

        df = spark.range(100).selectExpr("id", "id % 7 AS m")
        plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range (0, 100") == 1  # one scan feeds every stat
