"""Skew handling + plan-shape assertions (north_rule: 'partitioning /
shuffle / skew handled explicitly').

The reference has no skew story (SURVEY.md §4 — all in RAM, one node);
at 10^12 turns the Zipf-hot conv_ids dominate. The levers, in order:

1. AQE (on by default in session.py): skew-join splitting + shuffle
   coalescing — handles the aggregate and join shuffles at runtime.
2. REBALANCE hint before partitioned writes (tablestore._write_data).
3. Explicit salting (below) for the rare operator AQE can't split:
   a window/groupBy keyed ONLY by the hot key. Two-phase aggregation:
   partial agg on (key, salt) → final agg on key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, variant: str, buckets: int = 16) -> DataFrame:
    """Spread a hot `key` over `buckets` partitions using `variant`
    (a column that varies within the key, e.g. turn_idx) as the salt
    source. Deterministic across retries — never rand()."""
    salt = F.pmod(F.xxhash64(F.col(variant)), F.lit(buckets))
    return df.repartition(F.col(key), salt.alias("_salt"))


def salted_count(df: DataFrame, keys: list[str], variant: str, buckets: int = 64) -> DataFrame:
    """Two-phase count for skewed grouping keys: partial count on
    (keys + salt) — map-side combine keeps each reducer's input
    bounded — then final sum on keys. Equivalent to groupBy(keys)
    .count() but immune to a single reducer owning a hot key."""
    salt = F.pmod(F.xxhash64(F.col(variant)), F.lit(buckets)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").alias("n"))


# ---------------------------------------------------------------------------
# plan-shape assertions (used by tests; cheap introspection via explain)
# ---------------------------------------------------------------------------

def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame, forbid_sort_merge: bool = True) -> str:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, f"expected BroadcastHashJoin:\n{plan}"
    if forbid_sort_merge:
        assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"
    return plan


def assert_pushed_filters(df: DataFrame, fragment: str) -> str:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter {fragment!r}:\n{plan}"
    )
    return plan


def count_exchanges(df: DataFrame) -> int:
    plan = physical_plan(df)
    return plan.count("Exchange")
