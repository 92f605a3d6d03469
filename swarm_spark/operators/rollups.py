"""Continuous aggregates: maintain coarser rollups from finer ones
incrementally (the hypertable/continuous-aggregate pattern).

The pipeline appends per-batch rows to `_agg_hourly` (sink, role,
tool, hour, n, batch_id). `refresh_daily` folds the hourly table into
a `_agg_daily` table idempotently: re-running after new batches
updates exactly the affected days via merge_upsert — no full rebuild,
no double counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tablestore import IcepackCatalog

DAILY_KEYS = ["sink", "role", "tool", "day"]


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    return (
        hourly.groupBy(
            "sink", "role", "tool", F.date_trunc("day", "hour").alias("day")
        )
        .agg(F.sum("n").alias("n"))
    )


def refresh_daily(
    spark: SparkSession,
    catalog: IcepackCatalog,
    hourly_table: str = "_agg_hourly",
    daily_table: str = "_agg_daily",
    since_snapshot: int | None = None,
) -> dict:
    """Fold hourly → daily. With since_snapshot, only days touched by
    hourly rows added AFTER that snapshot are recomputed (incremental
    refresh); those days are recomputed from the FULL hourly table so
    the result is exact, then upserted by (sink, role, tool, day).

    Returns {'days_refreshed': int, 'snapshot': hourly snapshot id}."""
    ht = catalog.table(hourly_table)
    cur = ht.current_snapshot()
    hourly = ht.read(spark)

    if since_snapshot is not None:
        prev_dirs = set()
        for s in ht.snapshots():
            if s["snapshot_id"] <= since_snapshot:
                prev_dirs.update(s["data_dirs"])
        new_dirs = [d for d in cur["data_dirs"] if d not in prev_dirs]
        if not new_dirs:
            return {"days_refreshed": 0, "snapshot": cur["snapshot_id"]}
        new_rows = spark.read.option("mergeSchema", "true").parquet(*new_dirs)
        touched = (
            new_rows.select(F.date_trunc("day", "hour").alias("day")).distinct()
        )
        scope = hourly.join(F.broadcast(touched),
                            F.date_trunc("day", hourly["hour"]) == touched["day"],
                            "left_semi")
    else:
        scope = hourly

    daily = daily_from_hourly(scope).withColumn("timestamp", F.col("day"))
    n_days = daily.select("day").distinct().count()
    catalog.table(daily_table).merge_upsert(spark, daily, keys=DAILY_KEYS)
    return {"days_refreshed": n_days, "snapshot": cur["snapshot_id"]}
