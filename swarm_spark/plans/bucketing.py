"""Bucketed co-located joins — the pre-shuffle lever for REPEATED
large-large joins at 100 TB.

Broadcast handles small dims and AQE handles one-off skew, but a fact
table joined on the same key by many queries should pay its shuffle
ONCE at write time: `bucketBy(n, key)` persists data pre-hash-
partitioned, and Catalyst then plans bucket-aligned joins with NO
Exchange on either side (both inputs already share the partitioning).

The reference has no analogue (single-node, everything in RAM); this
is Spark-native capacity the rebuild exposes for the 10^12-turn
workload: bucket the routed sink tables by conv_id and every
conversation-keyed join/window downstream skips its shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .skew import physical_plan


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort_by: str | list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist df hash-bucketed by key (and optionally sorted within
    buckets — sortBy additionally removes the join's Sort nodes)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format(fmt).bucketBy(buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str,
    key: str | list[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket counts the
    plan has NO Exchange on either join input."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def assert_exchange_free_join(df: DataFrame) -> str:
    """Plan-shape check: a join is present and NO Exchange feeds it."""
    plan = physical_plan(df)
    assert "Join" in plan, plan
    assert "Exchange" not in plan, f"join still shuffles:\n{plan}"
    return plan
