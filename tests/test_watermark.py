"""Watermark semantics: late turns beyond the watermark are dropped
from the streaming hourly aggregate (append mode)."""

from __future__ import annotations

import datetime as dt


def _write_file(spark, path, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules, default_schema_rules, default_tool_dim,
    )
    from swarm_spark.streaming.ingest import hourly_counts_stream, stream_transcripts

    src = str(tmp_path / "src")
    t = dt.datetime(2026, 1, 1, 10, 0)

    cfg = PipelineConfig(
        event_rules=default_event_rules(),
        schema_rules=default_schema_rules(),
        warehouse=str(tmp_path / "wh"),
        tool_dim=default_tool_dim(spark),
    )
    pipe = IngestPipeline(spark, cfg)
    out_dir = str(tmp_path / "out")

    def run_pass():
        # fresh query, SAME checkpoint: the watermark persists across
        # restarts, so the second pass sees watermark=12:00 up front
        agg = hourly_counts_stream(
            stream_transcripts(spark, src, max_files_per_trigger=1), pipe,
            watermark="2 hours",
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: df.write.mode("append").parquet(out_dir))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    # pass 1: 3 on-time user turns at 10:00-10:30 + 1 at 14:00 that
    # advances the watermark to 12:00 (wm = max_event_time - 2h)
    _write_file(spark, src, [
        ("c1", 0, "user", "a", None, t),
        ("c1", 1, "user", "b", None, t + dt.timedelta(minutes=15)),
        ("c1", 2, "user", "c", None, t + dt.timedelta(minutes=30)),
        ("c2", 0, "user", "d", None, dt.datetime(2026, 1, 1, 14, 0)),
    ])
    run_pass()

    # pass 2: one LATE user turn at 09:15 — its hour window (09:00)
    # predates the persisted 12:00 watermark → must be dropped
    _write_file(spark, src, [
        ("c3", 0, "user", "late", None, dt.datetime(2026, 1, 1, 9, 15)),
    ])
    run_pass()

    pdf = spark.read.parquet(out_dir).filter("sink = 'sink_user'").toPandas()
    got = dict(pdf.groupby("hour").n.sum())
    # 10:00 window emitted with the 3 on-time turns; the late 09:15 row
    # never appears; the 14:00 window stays open (watermark not past it)
    assert got.get(dt.datetime(2026, 1, 1, 10, 0)) == 3
    assert dt.datetime(2026, 1, 1, 9, 0) not in got


def test_late_but_within_watermark_kept(spark, tmp_path):
    """Boundary pinning: a late row ABOVE the watermark line is
    aggregated; one at/below it is dropped (drop/keep both pinned in
    one query)."""
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules, default_schema_rules, default_tool_dim,
    )
    from swarm_spark.streaming.ingest import hourly_counts_stream, stream_transcripts

    src = str(tmp_path / "src")
    t = dt.datetime(2026, 1, 1, 10, 0)
    cfg = PipelineConfig(
        event_rules=default_event_rules(),
        schema_rules=default_schema_rules(),
        warehouse=str(tmp_path / "wh"),
        tool_dim=default_tool_dim(spark),
    )
    pipe = IngestPipeline(spark, cfg)
    out_dir = str(tmp_path / "out")

    def run_pass():
        agg = hourly_counts_stream(
            stream_transcripts(spark, src, max_files_per_trigger=1), pipe,
            watermark="2 hours",
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: df.write.mode("append").parquet(out_dir))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    # pass 1: advance watermark to 12:00 (max 14:00 - 2h)
    _write_file(spark, src, [
        ("c1", 0, "user", "on-time", None, t),
        ("c2", 0, "user", "max", None, dt.datetime(2026, 1, 1, 14, 0)),
    ])
    run_pass()

    # pass 2: one late row INSIDE the watermark (13:00 > 12:00 → keep),
    # one late row at 11:59 (< 12:00 → drop)
    _write_file(spark, src, [
        ("c3", 0, "user", "late-keep", None, dt.datetime(2026, 1, 1, 13, 0)),
        ("c4", 0, "user", "late-drop", None, dt.datetime(2026, 1, 1, 11, 59)),
        # push watermark far ahead so kept windows can FINALIZE (append
        # mode emits only closed windows)
        ("c5", 0, "user", "advance", None, dt.datetime(2026, 1, 2, 6, 0)),
    ])
    run_pass()
    run_pass()  # one more pass to flush finalized windows

    import pandas as pd

    pdf = spark.read.parquet(out_dir).toPandas()
    hours = set(pd.to_datetime(pdf.hour).dt.strftime("%d-%H"))
    assert "01-13" in hours     # late-but-within kept
    assert "01-11" not in hours  # beyond watermark dropped
