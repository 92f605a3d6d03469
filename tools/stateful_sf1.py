"""sf-scale validation of the custom stateful streaming operator
(r4 verdict #7): run conversation_progress (applyInPandasWithState)
over the FULL transcripts table derived from an sf directory's events,
WITH A CHECKPOINT RESTART MID-RUN — phase 1 streams half the source
files to completion, then the query restarts from the same checkpoint
over the remaining files, so per-conversation state for every
conversation spanning both phases MUST be restored from the state
store. Final per-conversation counters are compared TUPLE-LEVEL
against the batch aggregate over the same input.

Usage: python tools/stateful_sf1.py [sf_dir] [files] [files_per_trigger]
       (defaults: /tmp/sf1, 32 source files, 4 per trigger)
Prints ONE JSON line; paste into BENCH.md / NOTES_r5.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from swarm_spark.datagen import transcripts_from_events
    from swarm_spark.session import get_spark
    from swarm_spark.streaming.ingest import stream_transcripts
    from swarm_spark.streaming.stateful import conversation_progress

    spark = get_spark("stateful_sf1", cpus=32, shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="swarm_stateful_sf1_")
    staged = os.path.join(work, "staged")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    t = transcripts_from_events(spark, sf_dir)
    t.repartition(n_files).write.parquet(staged)
    parts = sorted(glob.glob(os.path.join(staged, "part-*")))
    t = spark.read.parquet(staged)
    n_rows = t.count()

    def run_phase() -> float:
        prog = conversation_progress(
            stream_transcripts(spark, src, max_files_per_trigger=per_trigger))

        def sink(batch_df, epoch_id):
            batch_df.withColumn("_epoch", F.lit(epoch_id)) \
                .write.mode("append").parquet(out)

        t0 = time.time()
        q = (prog.writeStream.outputMode("update").foreachBatch(sink)
             .trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination()
        return time.time() - t0

    # phase 1: first half of the files, run to completion (checkpoint
    # survives), then RESTART over the remaining files — the restart
    # must resume every conversation's counters from the state store
    half = len(parts) // 2
    for p in parts[:half]:
        os.link(p, os.path.join(src, os.path.basename(p)))
    wall1 = run_phase()
    for p in parts[half:]:
        os.link(p, os.path.join(src, os.path.basename(p)))
    wall2 = run_phase()

    # final counters = last update-mode row per conversation; epochs
    # restart at 0 per phase, so order by file mtime-free global
    # sequence: tag phase via _epoch offset is unnecessary — use the
    # cumulative turns_total (monotone per conversation) as the order
    w = Window.partitionBy("conv_id").orderBy(F.desc("turns_total"))
    final = (spark.read.parquet(out)
             .withColumn("_rk", F.row_number().over(w))
             .filter("_rk = 1")
             .select("conv_id", "turns_total", "errors_total",
                     "tool_calls_total", "max_turn_idx"))
    ref = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns_total"),
        F.sum(F.col("text").rlike("ERR-[0-9]{4}").cast("long"))
         .alias("errors_total"),
        F.sum(F.col("text").contains("CALL tool=").cast("long"))
         .alias("tool_calls_total"),
        F.max("turn_idx").alias("max_turn_idx"))
    n_convs = ref.count()
    mism = final.exceptAll(ref).count() + ref.exceptAll(final).count()
    # conversations spanning both phases prove state restoration: their
    # phase-2 rows start from restored counters, not zero
    spanning = (spark.read.parquet(out).groupBy("conv_id")
                .agg(F.count(F.lit(1)).alias("emits"))
                .filter("emits > 1").count())

    wall = wall1 + wall2
    print(json.dumps({
        "sf_dir": sf_dir, "rows": n_rows, "conversations": n_convs,
        "source_files": n_files, "files_per_trigger": per_trigger,
        "phase1_wall_sec": round(wall1, 2), "phase2_wall_sec": round(wall2, 2),
        "stateful_wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "restart_mid_run": True,
        "multi_emit_conversations": spanning,
        "mismatches_vs_batch": mism,
        "equal_batch": mism == 0,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    if mism:
        raise SystemExit(1)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
