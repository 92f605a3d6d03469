"""Join operators Spark lacks natively: as-of join, range join.

As-of join (backward): for each left row, the single right row with
the greatest right_ts <= left_ts within the same `by` key — the
standard temporal-enrichment join (attach the config/profile/rule
version in force at event time).

Implementation is the UNION + WINDOW construction, not a per-group
pandas merge_asof: tag both sides, union on (by, ts), and carry the
last-seen right payload forward with last_value(ignorenulls) over
(by ORDER BY ts, side). One hash shuffle on `by`, sort within
partitions — the same cost profile as a sort-merge join, fully
codegen'd, no Python. Scales to arbitrarily large BOTH sides (the
pandas merge_asof alternative requires one side to fit per group).

Tie rule: at equal timestamps the right row sorts FIRST, so a left
row matches a right row with right_ts == left_ts (DuckDB ASOF JOIN's
`>=` semantics — used as the test oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join; right payload columns come back null when
    no right row precedes the left row."""
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {right_ts}
    ]

    payload = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),          # right sorts first at equal ts
        payload.alias("_payload"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    # align schemas: right side carries nulls for left columns
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    unioned = l.select(*l_cols, "_t", "_side", "_payload").unionByName(
        r.select(*l_cols, "_t", "_side", "_payload")
    )

    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).drop("_t", "_side", "_payload")
    return out.select(
        *l_cols, *[F.col(f"_match.{c}").alias(c) for c in value_cols]
    ).drop("_match")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Point-in-interval range join via bucketization: intervals are
    exploded into the buckets they overlap, points join on their
    bucket (equi-join Catalyst can hash-partition), then the exact
    range predicate filters. Avoids the O(n·m) broadcast-nested-loop
    Spark would otherwise plan for a pure inequality join.

    bucket_width should be on the order of the TYPICAL interval
    length: explosion factor = interval_len / bucket_width + 1.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    lo_b = (F.col(right_lo) / bucket_width).cast("long")
    hi_b = (F.col(right_hi) / bucket_width).cast("long")
    r = right.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    l = left.withColumn("_bucket", (F.col(left_point) / bucket_width).cast("long"))
    cond = [l["_bucket"] == r["_bucket"]] + [l[c] == r[c] for c in by]
    joined = l.join(r, cond)
    return (
        joined.filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) < F.col(right_hi))
        )
        .drop(l["_bucket"]).drop(r["_bucket"])
        .drop(*[r[c] for c in by])
    )
