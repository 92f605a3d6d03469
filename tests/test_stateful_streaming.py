"""applyInPandasWithState conversation tracker: state must accumulate
across micro-batches and survive a query restart from checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_until_done(spark, src, ckpt, out_dir):
    from swarm_spark.streaming.ingest import stream_transcripts
    from swarm_spark.streaming.stateful import conversation_progress

    prog = conversation_progress(stream_transcripts(spark, src, max_files_per_trigger=1))

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        prog.writeStream.outputMode("update").foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    q.awaitTermination(120)


def test_state_accumulates_and_survives_restart(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2026, 1, 1)

    _write_batch(spark, src, [
        ("c1", 0, "user", "hello", None, ts),
        ("c1", 1, "assistant", 'CALL tool=bash args={"q":1}', "bash", ts),
        ("c2", 0, "user", "hi ERR-0001", None, ts),
    ])
    out1 = str(tmp_path / "out1")
    _run_until_done(spark, src, ckpt, out1)
    got = {r.conv_id: r for r in spark.read.parquet(out1).collect()}
    assert got["c1"].turns_total == 2 and got["c1"].tool_calls_total == 1
    assert got["c2"].errors_total == 1

    # second run, new files only — state must RESUME from checkpoint
    _write_batch(spark, src, [
        ("c1", 2, "tool", "output ERR-0042", "bash", ts),
        ("c3", 0, "user", "new conv", None, ts),
    ])
    out2 = str(tmp_path / "out2")
    _run_until_done(spark, src, ckpt, out2)
    got2 = {r.conv_id: r for r in spark.read.parquet(out2).collect()}
    # only touched conversations emit in update mode
    assert got2["c1"].turns_total == 3          # 2 (from state) + 1 new
    assert got2["c1"].errors_total == 1
    assert got2["c1"].max_turn_idx == 2
    assert got2["c3"].turns_total == 1
    assert "c2" not in got2                      # untouched → no emission


def test_event_time_timeout_closes_and_gcs_state(spark, tmp_path):
    """Conversation idle past watermark+timeout emits one final
    closed=true row and its state is REMOVED (bounded state store)."""
    import datetime as dt

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 10, 0)

    def run(out_dir):
        from swarm_spark.streaming.ingest import stream_transcripts
        from swarm_spark.streaming.stateful import conversation_progress

        stream = stream_transcripts(spark, src, max_files_per_trigger=1) \
            .withWatermark("ts", "10 minutes")
        prog = conversation_progress(stream, idle_timeout_minutes=30)
        q = (
            prog.writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: df.write.mode("append").parquet(out_dir))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt).start()
        )
        q.awaitTermination(180)

    # batch 1: conv A active at 10:00
    _write_batch(spark, src, [("A", 0, "user", "hello", None, t0)])
    # batch 2: conv B hours later -> watermark jumps past A's timeout
    _write_batch(spark, src, [
        ("B", 0, "user", "late ERR-0001",
         None, t0 + dt.timedelta(hours=6)),
    ])
    # batch 3: another advance so the timeout actually FIRES (timeouts
    # trigger at the start of a batch after the watermark moved)
    _write_batch(spark, src, [
        ("B", 1, "assistant", "x", None, t0 + dt.timedelta(hours=7)),
    ])
    out = str(tmp_path / "out")
    run(out)

    import pandas as pd

    pdf = spark.read.parquet(out).toPandas()
    a_rows = pdf[pdf.conv_id == "A"].sort_values("closed")
    assert list(a_rows.closed) == [False, True]  # active row, then GC row
    closed = a_rows[a_rows.closed].iloc[0]
    assert closed.turns_total == 1 and closed.max_turn_idx == 0
    # B stays open
    assert not pdf[(pdf.conv_id == "B") & pdf.closed].shape[0]

    # batch 4: conv A reappears AFTER GC -> counters restart from zero
    _write_batch(spark, src, [
        ("A", 5, "user", "back", None, t0 + dt.timedelta(hours=8)),
    ])
    out2 = str(tmp_path / "out2")
    run(out2)
    pdf2 = spark.read.parquet(out2).toPandas()
    re_a = pdf2[(pdf2.conv_id == "A") & ~pdf2.closed].iloc[0]
    assert re_a.turns_total == 1 and re_a.max_turn_idx == 5  # state was gone
