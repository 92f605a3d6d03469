"""Continuous-aggregate rollup: exactness, idempotency, incremental
refresh correctness across batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from swarm_spark.operators.rollups import refresh_daily
from swarm_spark.tablestore import IcepackCatalog

HOURLY_DDL = ("sink string, role string, tool string, hour timestamp, "
              "n bigint, batch_id string, timestamp timestamp")


def _hourly_rows(day, sink="s1", n_hours=3, n=5, batch="b1"):
    base = dt.datetime(2026, 1, day, 0, 0)
    return [
        (sink, "user", "bash", base + dt.timedelta(hours=h), n, batch,
         base + dt.timedelta(hours=h))
        for h in range(n_hours)
    ]


def test_full_and_incremental_refresh(spark, tmp_path):
    cat = IcepackCatalog(str(tmp_path))
    ht = cat.table("_agg_hourly")
    snap1 = ht.append(spark.createDataFrame(
        _hourly_rows(1) + _hourly_rows(2), HOURLY_DDL))

    res = refresh_daily(spark, cat)
    assert res["days_refreshed"] == 2
    daily = {r.day.day: r.n for r in cat.table("_agg_daily").read(spark).collect()}
    assert daily == {1: 15, 2: 15}  # 3 hours × 5

    # idempotent: refresh again with no new data → same daily table
    refresh_daily(spark, cat)
    daily2 = {r.day.day: r.n for r in cat.table("_agg_daily").read(spark).collect()}
    assert daily2 == daily

    # new batch adds more rows for day 2 and a new day 3
    ht.append(spark.createDataFrame(
        _hourly_rows(2, n_hours=2, n=7, batch="b2") + _hourly_rows(3, batch="b2"),
        HOURLY_DDL))
    res2 = refresh_daily(spark, cat, since_snapshot=snap1["snapshot_id"])
    assert res2["days_refreshed"] == 2  # only days 2 and 3 recomputed
    daily3 = {r.day.day: r.n for r in cat.table("_agg_daily").read(spark).collect()}
    assert daily3 == {1: 15, 2: 15 + 14, 3: 15}  # exact, no double count

    # incremental with nothing new → no-op
    res3 = refresh_daily(spark, cat, since_snapshot=res2["snapshot"])
    assert res3["days_refreshed"] == 0


def test_refresh_after_pipeline_run(spark, tmp_path):
    from swarm_spark.datagen import generate_transcripts
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules, default_schema_rules, default_tool_dim,
    )

    cfg = PipelineConfig(default_event_rules(), default_schema_rules(),
                         str(tmp_path / "wh"), tool_dim=default_tool_dim(spark))
    pipe = IngestPipeline(spark, cfg)
    t = generate_transcripts(spark, 1000, n_convs=20)
    pipe.run(t, batch_id="b1")
    refresh_daily(spark, pipe.catalog)
    hourly_total = pipe.catalog.table("_agg_hourly").read(spark).agg(
        F.sum("n")).collect()[0][0]
    daily_total = pipe.catalog.table("_agg_daily").read(spark).agg(
        F.sum("n")).collect()[0][0]
    assert hourly_total == daily_total
