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
