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


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """asof_join for HOT `by` keys. The plain construction windows
    over (by): one Zipf-hot key = one straggler task owning half the
    data. This variant is the distributed prefix-carry:

      1. rows are chunked by time (`chunk_seconds`); the carry window
         runs over (by, chunk) — partition size is bounded by the
         chunk, not the key;
      2. a per-(by, chunk) summary keeps only the LAST right payload
         of each chunk (map-side-combined aggregate, one row per
         chunk);
      3. an exclusive prefix window over the TINY summary table
         (#chunks rows per key) yields each chunk's carry-in;
      4. rows that found no within-chunk match take the chunk's
         carry-in via an equi-join on (by, chunk).

    Result is identical to asof_join; cost is one bounded-partition
    window + one small-table window + one hash join.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {right_ts}
    ]

    payload = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    l_cols = list(left.columns)
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    unioned = l.select(*l_cols, "_t", "_side", "_payload").unionByName(
        r.select(*l_cols, "_t", "_side", "_payload")
    )
    # cast: inputs may be TIMESTAMP_NTZ (parquet); session tz is UTC
    chunk = F.floor(
        F.unix_micros(F.col("_t").cast("timestamp")) / (chunk_seconds * 1_000_000)
    ).alias("_c")
    unioned = unioned.withColumn("_c", chunk)

    w_in = (
        Window.partitionBy(*by, "_c")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w_in)
    )

    # per-chunk summary: last right payload of each (by, chunk),
    # joined onto the FULL chunk universe (a left-only chunk still
    # needs the carry from earlier right-bearing chunks)
    summary = (
        r.withColumn("_c", chunk)
        .groupBy(*by, "_c")
        .agg(F.max_by("_payload", "_t").alias("_last"))
    )
    universe = unioned.select(*by, "_c").distinct()
    summary = universe.join(summary, [*by, "_c"], "left")
    w_carry = (
        Window.partitionBy(*by)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.withColumn(
        "_carry", F.last("_last", ignorenulls=True).over(w_carry)
    ).select(*by, "_c", "_carry")

    out = (
        within.filter(F.col("_side") == 1)
        .join(carry, [*by, "_c"], "left")
        .withColumn("_match", F.coalesce("_match", "_carry"))
    )
    return out.select(
        *l_cols, *[F.col(f"_match.{c}").alias(c) for c in value_cols]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    by: str | list[str] | None = None,
    salt: int | None = None,
) -> DataFrame:
    """Point-in-interval range join via bucketization: intervals are
    exploded into the buckets they overlap, points join on their
    bucket (equi-join Catalyst can hash-partition), then the exact
    range predicate filters. Avoids the O(n·m) broadcast-nested-loop
    Spark would otherwise plan for a pure inequality join.

    bucket_width should be on the order of the TYPICAL interval
    length: explosion factor = interval_len / bucket_width + 1.

    salt: for a hot (by, bucket) pair that AQE's skew-join split can't
    help (e.g. one user owning half the points in one value bucket),
    replicate the RIGHT side `salt` ways and spread the left by a
    deterministic hash — reducer input per task is bounded by
    hot_size/salt. Leave None where key distribution is sane: the
    replication multiplies the right side's shuffle volume.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    lo_b = (F.col(right_lo) / bucket_width).cast("long")
    hi_b = (F.col(right_hi) / bucket_width).cast("long")
    r = right.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    l = left.withColumn("_bucket", (F.col(left_point) / bucket_width).cast("long"))
    if salt:
        # deterministic (never rand(): retries must re-plan identically)
        l = l.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(left_point)), F.lit(salt))
        )
        r = r.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
    cond = [l["_bucket"] == r["_bucket"]] + [l[c] == r[c] for c in by]
    if salt:
        cond.append(l["_salt"] == r["_salt"])
    joined = l.join(r, cond)
    out = (
        joined.filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) < F.col(right_hi))
        )
        .drop(l["_bucket"]).drop(r["_bucket"])
        .drop(*[r[c] for c in by])
    )
    if salt:
        out = out.drop(l["_salt"]).drop(r["_salt"])
    return out
