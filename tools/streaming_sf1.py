"""sf-scale Structured Streaming validation + throughput measurement
(r3 verdict #6): run start_ingest_stream (availableNow, light epochs)
over the FULL transcripts table derived from an sf directory's events,
validate per-sink landed counts AND the tuple-level hourly aggregate
against the batch plans, and report epochs/sec + rows/sec.

Usage: python tools/streaming_sf1.py [sf_dir] [files] [files_per_trigger]
       (defaults: /tmp/sf1, 32 source files, 4 per trigger -> 8 epochs)
Prints ONE JSON line; paste into BENCH.md / NOTES_r4.
"""

from __future__ import annotations

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

    from swarm_spark.datagen import transcripts_from_events
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules,
        default_schema_rules,
        default_tool_dim,
    )
    from swarm_spark.session import get_spark
    from swarm_spark.streaming.ingest import (
        hourly_counts_stream,
        start_ingest_stream,
        stream_transcripts,
    )

    spark = get_spark("streaming_sf1", cpus=32, shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="swarm_stream_sf1_")
    src = os.path.join(work, "src")

    t = transcripts_from_events(spark, sf_dir)
    t.repartition(n_files).write.parquet(src)
    t = spark.read.parquet(src)
    n_rows = t.count()

    def mkpipe(name: str) -> IngestPipeline:
        return IngestPipeline(spark, PipelineConfig(
            event_rules=default_event_rules(),
            schema_rules=default_schema_rules(),
            warehouse=os.path.join(work, name),
            tool_dim=default_tool_dim(spark),
        ))

    out: dict = {"sf_dir": sf_dir, "rows": n_rows, "source_files": n_files,
                 "files_per_trigger": per_trigger,
                 "loadavg": [round(x, 2) for x in os.getloadavg()]}

    # -- ingest stream: light epochs, availableNow --------------------
    pipe = mkpipe("wh_stream")
    t0 = time.time()
    q = start_ingest_stream(
        stream_transcripts(spark, src, max_files_per_trigger=per_trigger),
        pipe, checkpoint_dir=os.path.join(work, "ckpt"), epoch_mode="light",
    )
    q.awaitTermination()
    wall = time.time() - t0
    manifest_dir = os.path.join(work, "wh_stream", "_manifest")
    epochs = len([f for f in os.listdir(manifest_dir) if f.startswith("epoch-")])
    landed = {s: pipe.catalog.table(s).read(spark).count()
              for s in pipe.catalog.tables() if s.startswith("sink_")}

    # batch reference over the same input
    ref_pipe = mkpipe("wh_ref")
    ref_pipe.config.assume_ordered = True
    routed = ref_pipe.routed(t, ingest_id="ref")
    exp = {r.sink_table: r["count"]
           for r in routed.groupBy("sink_table").count().collect()}
    assert landed == exp, f"per-sink mismatch: {landed} != {exp}"
    out["stream_wall_sec"] = round(wall, 2)
    out["rows_per_sec"] = round(n_rows / wall, 1)
    out["epochs"] = epochs
    out["epochs_per_sec"] = round(epochs / wall, 3) if epochs else None
    out["per_sink_rows"] = landed
    out["per_sink_equal_batch"] = True

    # -- hourly aggregate stream vs batch aggregate (tuple-level) -----
    agg_pipe = mkpipe("wh_agg")
    t0 = time.time()
    aq = (
        hourly_counts_stream(
            stream_transcripts(spark, src, max_files_per_trigger=per_trigger),
            agg_pipe)
        .writeStream.outputMode("complete")
        .format("memory").queryName("hourly_sf1")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt_agg"))
        .start()
    )
    aq.awaitTermination()
    agg_wall = time.time() - t0
    got = {(r.sink, r.role, r.tool, r.hour, r.n)
           for r in spark.sql("SELECT * FROM hourly_sf1").collect()}
    ref_pipe2 = mkpipe("wh_ref2")
    ref_pipe2.config.assume_ordered = True
    expected = {(r.sink, r.role, r.tool, r.hour, r.n)
                for r in ref_pipe2.aggregate(
                    ref_pipe2.routed(t, ingest_id="ref")).collect()}
    assert got == expected, (
        f"hourly aggregate mismatch: {len(got)} vs {len(expected)} cells, "
        f"diff={list(got ^ expected)[:5]}"
    )
    out["hourly_stream_wall_sec"] = round(agg_wall, 2)
    out["hourly_cells"] = len(got)
    out["hourly_equal_batch"] = True

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
