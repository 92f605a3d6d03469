"""Data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from swarm_spark.operators.expectations import (
    ExpectationError,
    fail_on_violations,
    validate,
)


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0, "u1"),
            (2, "b", 50.0, "u2"),
            (2, "zz", -1.0, "u9"),      # dup id, bad enum, below range, bad FK
            (None, "a", 200.0, None),   # null id, above range, null FK
            (4, None, None, "u1"),      # null enum/value (unchecked, not violations)
        ],
        "id bigint, cat string, x double, fk string",
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([("u1",), ("u2",), ("u2",)], "k string")


def _as_map(report):
    return {(r["rule"], r["target"]): r for r in report.collect()}


class TestValidate:
    def test_all_rule_kinds(self, spark, messy, dim):
        rep = _as_map(
            validate(
                messy,
                [
                    ("not_null", "id"),
                    ("unique", ["id"]),
                    ("accepted_values", "cat", ["a", "b"]),
                    ("range", "x", 0.0, 100.0),
                    ("matches", "cat", "^[a-z]$"),
                    ("referential", "fk", dim, "k"),
                ],
            )
        )
        r = rep[("not_null", "id")]
        assert (r["checked"], r["violations"], r["passed"]) == (5, 1, False)
        r = rep[("unique", "id")]
        assert (r["checked"], r["violations"], r["passed"]) == (4, 1, False)
        r = rep[("accepted_values", "cat")]
        assert (r["checked"], r["violations"]) == (4, 1)  # 'zz'; NULL unchecked
        r = rep[("range", "x")]
        assert (r["checked"], r["violations"]) == (4, 2)  # -1 and 200
        r = rep[("matches", "cat")]
        assert (r["checked"], r["violations"]) == (4, 1)  # 'zz' two chars
        r = rep[("referential", "fk")]
        assert (r["checked"], r["violations"]) == (4, 1)  # u9

    def test_clean_table_passes_and_gate(self, spark, dim):
        clean = spark.createDataFrame(
            [(1, "a", 1.0, "u1"), (2, "b", 2.0, "u2")],
            "id bigint, cat string, x double, fk string",
        )
        rules = [
            ("not_null", "id"),
            ("unique", ["id"]),
            ("accepted_values", "cat", ["a", "b"]),
            ("range", "x", 0.0, 10.0),
            ("referential", "fk", dim, "k"),
        ]
        rep = fail_on_violations(clean, rules)  # must not raise
        assert all(r["passed"] for r in rep.collect())

    def test_gate_raises_with_detail(self, messy, dim):
        with pytest.raises(ExpectationError, match=r"not_null\(id\): 1/5"):
            fail_on_violations(messy, [("not_null", "id")])

    def test_composite_unique_ignores_null_keys(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "y"), (None, "x"), (1, None)],
            "a bigint, b string",
        )
        rep = _as_map(validate(df, [("unique", ["a", "b"])]))
        r = rep[("unique", "a,b")]
        # 3 fully-non-null rows, 2 distinct tuples → 1 violation
        assert (r["checked"], r["violations"], r["passed"]) == (3, 1, False)

    def test_half_open_ranges(self, spark):
        df = spark.createDataFrame([(1, -5.0), (2, 5.0)], "id bigint, x double")
        lo_only = _as_map(validate(df, [("range", "x", 0.0, None)]))
        hi_only = _as_map(validate(df, [("range", "x", None, 0.0)]))
        assert lo_only[("range", "x")]["violations"] == 1
        assert hi_only[("range", "x")]["violations"] == 1
        with pytest.raises(ValueError, match="both None"):
            validate(df, [("range", "x", None, None)])

    def test_validation_errors(self, spark):
        df = spark.createDataFrame([(1,)], "id bigint")
        with pytest.raises(ValueError, match="at least one rule"):
            validate(df, [])
        with pytest.raises(ValueError, match="unknown expectation"):
            validate(df, [("frobnicate", "id")])

    def test_row_rules_cost_one_job(self, spark, messy):
        """All row-local rules compile into ONE aggregate → ONE Spark
        job regardless of rule count (adding a rule adds an
        expression, not a scan)."""
        sc = spark.sparkContext

        def jobs_for(rules, tag):
            sc.setJobGroup(f"jg-exp-{tag}", tag)
            try:
                validate(messy, rules)
            finally:
                sc.setJobGroup(None, None)
            return len(sc.statusTracker().getJobIdsForGroup(f"jg-exp-{tag}"))

        few = jobs_for([("not_null", "id")], "few")
        many = jobs_for(
            [
                ("not_null", "id"),
                ("not_null", "cat"),
                ("accepted_values", "cat", ["a", "b"]),
                ("range", "x", 0.0, 100.0),
                ("matches", "cat", "^[a-z]$"),
            ],
            "many",
        )
        # AQE may report a fixed number of job ids per action, but the
        # count must NOT grow with the rule list
        assert many == few <= 2

    def test_referential_rules_fused_one_job_per_dim(self, spark, messy, dim):
        """Referential rules cost ONE job per referenced (relation,
        key): checked + violations come from a single agg over one
        left-outer join, and multiple rules probing the same dimension
        key batch into that one job (2 rules vs same dim ⇒ no more
        jobs than 1 rule)."""
        sc = spark.sparkContext

        def jobs_for(rules, tag):
            sc.setJobGroup(f"jg-ref-{tag}", tag)
            try:
                rep = _as_map(validate(messy, rules))
            finally:
                sc.setJobGroup(None, None)
            return rep, len(sc.statusTracker().getJobIdsForGroup(f"jg-ref-{tag}"))

        rep1, one = jobs_for([("referential", "fk", dim, "k")], "one")
        assert rep1[("referential", "fk")]["violations"] == 1  # u9
        assert rep1[("referential", "fk")]["checked"] == 4

        # second rule against the SAME dim key (cat column as fake fk)
        rep2, two = jobs_for(
            [("referential", "fk", dim, "k"),
             ("referential", "cat", dim, "k")],
            "two",
        )
        assert rep2[("referential", "fk")]["violations"] == 1
        assert rep2[("referential", "cat")]["checked"] == 4  # non-null cats
        assert rep2[("referential", "cat")]["violations"] == 4  # none match
        assert two == one  # batched: same job count as a single rule

    def test_referential_empty_probe(self, spark, dim):
        """A probe column that is entirely NULL checks 0 rows and
        passes (no row in the grouped agg for that rule id)."""
        df = spark.createDataFrame([(None,), (None,)], "fk string")
        rep = _as_map(validate(df, [("referential", "fk", dim, "k")]))
        r = rep[("referential", "fk")]
        assert (r["checked"], r["violations"], r["passed"]) == (0, 0, True)
