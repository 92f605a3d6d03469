"""Benchmark harness — prints ONE JSON line per run.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:
  * ingest_e2e    — full parse→enrich→route→aggregate→sink-commit run
                    over the materialized transcripts table (exactly-once
                    machinery included; the north_rule metric's numerator
                    is this stage's turns/sec)
  * ingest_1m_e2e — same, at 1M generated rows (amortizes fixed commit
                    costs; the representative e2e turns/sec)
  * route_agg / gen_route_1m — routed+aggregate plan only
  * streaming_ingest — Structured Streaming availableNow over the same
                    transcripts (light-epoch foreachBatch into icepack)
  * tpch_q1, broadcast_join — generic scan/agg/join reference points
  * curation_pipeline, minhash_dedup, span_dedup, cosine_topk —
                    training-data operators

NOISE DISCIPLINE (r3 verdict #1): the sandbox host is shared and a
single measurement window can be inflated 3-5× by co-tenant steal —
r3's driver artifact recorded a phantom 1.6× "regression" a quiet-host
re-run disproved. So this harness runs every query in >=3 INTERLEAVED
rounds (round-robin across queries, so a slow window hits all queries
equally rather than one), reports the MIN per query, and stamps
os.getloadavg() at each round start into the JSON — the artifact
self-documents its measurement-window quality. Override rounds with
$SPARK_GRAFT_BENCH_ROUNDS.

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py which runs the pipeline job at two parallelism
levels in fresh JVMs; see BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GEN_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_GEN_ROWS", "1000000"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))


def main() -> None:
    from swarm_spark.datagen import generate_transcripts, transcripts_from_events
    from swarm_spark.pipeline import IngestPipeline, PipelineConfig
    from swarm_spark.presets import (
        default_event_rules,
        default_schema_rules,
        default_tool_dim,
    )
    from swarm_spark.session import get_spark

    spark = get_spark("swarm_spark_bench", cpus=CPUS, shuffle_partitions=CPUS)
    sf = float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else -1.0

    extras: dict[str, float] = {}
    results: dict[str, object] = {}

    def mkpipe(warehouse: str) -> IngestPipeline:
        cfg = PipelineConfig(
            event_rules=default_event_rules(),
            schema_rules=default_schema_rules(),
            warehouse=warehouse,
            tool_dim=default_tool_dim(spark),
        )
        return IngestPipeline(spark, cfg)

    # Warm the JVM to JIT steady state: the codegen'd parse/route
    # stages need several invocations before C2 compiles them (first
    # runs are 5-8x slower — see tools/scaling_bench.py). Warm with
    # the route+agg plan so every shared stage is hot before timing.
    warm_wh = tempfile.mkdtemp(prefix="swarm_bench_warm_")
    try:
        warm_pipe = mkpipe(warm_wh)
        warm_t = transcripts_from_events(spark, SF_DIR)
        prev = None
        for _ in range(5):
            t0 = time.time()
            warm_pipe.aggregate(warm_pipe.routed(warm_t)).count()
            w = time.time() - t0
            if prev is not None and w > 0.8 * prev:
                break
            prev = w
        # warm the write/commit plans too (sink parquet writers JIT
        # separately from the read/agg path)
        warm_pipe.run(warm_t, batch_id="warm")
    finally:
        shutil.rmtree(warm_wh, ignore_errors=True)

    # The pipeline's input contract is a TRANSCRIPTS table (north_star:
    # "Iceberg table of multi-turn transcripts"); the events→transcripts
    # derivation (a window shuffle) is this harness's way of building
    # that table deterministically, not part of the measured pipeline —
    # materialize it ONCE outside the timed region, then ingest from
    # the parquet-backed table like production would.
    t_path = tempfile.mkdtemp(prefix="swarm_bench_t_")
    transcripts_from_events(spark, SF_DIR).write.mode("overwrite").parquet(t_path)
    t = spark.read.parquet(t_path)
    n_t = t.count()

    gen_path = tempfile.mkdtemp(prefix="swarm_bench_gen_")
    generate_transcripts(spark, GEN_ROWS, seed=42).write.mode("overwrite").parquet(
        gen_path
    )
    gen_in = spark.read.parquet(gen_path)

    pipe_ro = mkpipe(tempfile.mkdtemp(prefix="swarm_bench_wh_ro_"))

    # file-skipping fixture (one-time, outside the timed region): the
    # 1M generated transcripts in an icepack table, sort-clustered on
    # conv_id so footer bounds are tight — then a point read with
    # prune= vs the same predicate as a full-scan filter
    from swarm_spark.filestats import residual_filter
    from swarm_spark.tablestore import IcepackCatalog

    fs_root = tempfile.mkdtemp(prefix="swarm_bench_fswh_")
    fs_tbl = IcepackCatalog(fs_root).table("transcripts")
    fs_tbl.append(gen_in)
    fs_tbl.compact(spark, target_files=64, cluster_by=["conv_id"])
    fs_cid = gen_in.select("conv_id").first()[0]
    fs_pred = [("conv_id", "=", fs_cid)]

    import __spark_entry__ as e

    # ---- job table: name -> fn(round_idx) -> result ------------------
    # Fresh warehouse/checkpoint per CALL for the committing jobs (the
    # exactly-once gate must never short-circuit a later round); the
    # mkdtemp is microseconds and inside the timed region, teardown is
    # outside it (post_cleanup). Several registry queries
    # (merge_upsert/bloom_point_read/semantic_dedup/pq_ann/...) create
    # their OWN temp warehouses internally; route every mkdtemp into a
    # bench-owned root so those are reclaimed per round too instead of
    # leaking a table copy per query per round.
    bench_tmp_root = tempfile.mkdtemp(prefix="swarm_bench_tmproot_")
    tempfile.tempdir = bench_tmp_root
    post_cleanup: list[str] = []

    def _fresh(prefix: str) -> str:
        d = tempfile.mkdtemp(prefix=prefix)
        post_cleanup.append(d)
        return d

    def j_ingest_e2e(i: int):
        return mkpipe(_fresh("swarm_bwh_")).run(t, batch_id=f"bench{i}")

    def j_ingest_1m(i: int):
        return mkpipe(_fresh("swarm_bwh1m_")).run(gen_in, batch_id=f"bench1m{i}")

    def j_streaming(i: int):
        from swarm_spark.streaming.ingest import start_ingest_stream, stream_transcripts

        pipe = mkpipe(_fresh("swarm_bwhs_"))
        stream = stream_transcripts(spark, t_path, max_files_per_trigger=8)
        q = start_ingest_stream(
            stream, pipe, checkpoint_dir=_fresh("swarm_bck_"), epoch_mode="light"
        )
        q.awaitTermination()
        return q.lastProgress

    def j_stateful(i: int):
        # custom stateful operator (applyInPandasWithState): cumulative
        # per-conversation counters over the same transcripts stream
        from pyspark.sql import functions as F

        from swarm_spark.streaming.ingest import stream_transcripts
        from swarm_spark.streaming.stateful import conversation_progress

        prev = results.get("stateful_progress")
        if prev:
            shutil.rmtree(prev, ignore_errors=True)  # previous round's output
        out = tempfile.mkdtemp(prefix="swarm_bst_")  # kept for the
        # post-run equality check; cleaned after it
        prog = conversation_progress(
            stream_transcripts(spark, t_path, max_files_per_trigger=8))

        def sink(batch_df, epoch_id):
            batch_df.withColumn("_epoch", F.lit(epoch_id)) \
                .write.mode("append").parquet(out)

        q = (prog.writeStream.outputMode("update").foreachBatch(sink)
             .trigger(availableNow=True)
             .option("checkpointLocation", _fresh("swarm_bstck_")).start())
        q.awaitTermination()
        return out

    jobs = {
        "ingest_e2e": j_ingest_e2e,
        "route_agg": lambda i: pipe_ro.aggregate(pipe_ro.routed(t)).count(),
        "gen_route_1m": lambda i: pipe_ro.aggregate(pipe_ro.routed(gen_in)).count(),
        "ingest_1m_e2e": j_ingest_1m,
        "streaming_ingest": j_streaming,
        "stateful_progress": j_stateful,
        "tpch_q1": lambda i: e.q_tpch_q1(spark, SF_DIR).collect(),
        "broadcast_join": lambda i: e.q_broadcast_join(spark, SF_DIR).collect(),
        "curation_pipeline": lambda i: e.q_curation(spark, SF_DIR).count(),
        "minhash_dedup": lambda i: e.q_minhash_pairs(spark, SF_DIR).count(),
        "span_dedup": lambda i: e.q_span_dedup(spark, SF_DIR).count(),
        "cosine_topk": lambda i: e.q_cosine_topk(spark, SF_DIR).collect(),
        # scan-speed curation projections (zero-shuffle): classifier
        # scoring and mixture resampling over the documents table
        "quality_model": lambda i: e.q_quality_model(spark, SF_DIR).count(),
        "mixture": lambda i: e.q_mixture(spark, SF_DIR).count(),
        # Iceberg-style file skipping: same predicate, pruned scan vs
        # full scan over the clustered 1M-row table
        "point_read_pruned": lambda i: fs_tbl.read(spark, prune=fs_pred).count(),
        "point_read_full": lambda i: residual_filter(fs_tbl.read(spark), fs_pred).count(),
        # COUNT pushdown: the same predicate answered from file stats
        # (boundary files only) vs the pruned-scan count above
        "meta_count": lambda i: fs_tbl.count_where(spark, fs_pred),
        # r5 session-2 operators at sf: dir-scoped MERGE, bloom point
        # read (build + probe), SemDeDup, PQ ADC pipeline
        "merge_upsert": lambda i: e.q_merge_upsert(spark, SF_DIR).count(),
        "bloom_point_read": lambda i: e.q_bloom_point_read(spark, SF_DIR).count(),
        "semantic_dedup": lambda i: e.q_semantic_dedup(spark, SF_DIR).count(),
        "pq_ann": lambda i: e.q_pq_ann(spark, SF_DIR).collect(),
    }

    times: dict[str, list[float]] = {name: [] for name in jobs}
    rounds_meta: list[dict] = []
    for r in range(ROUNDS):
        meta = {"loadavg": [round(x, 2) for x in os.getloadavg()], "queries": {}}
        for name, fn in jobs.items():
            t0 = time.time()
            results[name] = fn(r)
            sec = round(time.time() - t0, 3)
            times[name].append(sec)
            meta["queries"][name] = sec
            while post_cleanup:
                shutil.rmtree(post_cleanup.pop(), ignore_errors=True)
            # reclaim query-internal temp warehouses (*_wh_ prefixes
            # under the redirected tempdir) — the query has been fully
            # consumed (count/collect), nothing re-reads them
            for d in os.listdir(bench_tmp_root):
                if "_wh_" in d:
                    shutil.rmtree(os.path.join(bench_tmp_root, d),
                                  ignore_errors=True)
        rounds_meta.append(meta)

    timings = {name: min(ts) for name, ts in times.items()}

    res = results["ingest_e2e"]
    extras["ingest_turns_per_sec"] = round(n_t / timings["ingest_e2e"], 1)
    extras["ingest_input_rows"] = n_t
    extras["ingest_routed_rows"] = res.routed_rows
    extras["gen_rows"] = GEN_ROWS
    extras["gen_turns_per_sec"] = round(GEN_ROWS / timings["gen_route_1m"], 1)
    extras["ingest_1m_turns_per_sec"] = round(GEN_ROWS / timings["ingest_1m_e2e"], 1)
    extras["ingest_1m_routed_rows"] = results["ingest_1m_e2e"].routed_rows
    extras["streaming_turns_per_sec"] = round(n_t / timings["streaming_ingest"], 1)
    # stateful-operator validation (outside the timed region): the last
    # update-mode row per conversation must equal the batch aggregate —
    # tuple-level, every conversation
    from pyspark.sql import Window
    from pyspark.sql import functions as _F

    st_out = results["stateful_progress"]
    w = Window.partitionBy("conv_id").orderBy(_F.desc("_epoch"))
    final = (spark.read.parquet(st_out)
             .withColumn("_rk", _F.row_number().over(w))
             .filter("_rk = 1")
             .select("conv_id", "turns_total", "errors_total",
                     "tool_calls_total", "max_turn_idx"))
    ref = t.groupBy("conv_id").agg(
        _F.count(_F.lit(1)).alias("turns_total"),
        _F.sum(_F.col("text").rlike("ERR-[0-9]{4}").cast("long")).alias("errors_total"),
        _F.sum(_F.col("text").contains("CALL tool=").cast("long")).alias("tool_calls_total"),
        _F.max("turn_idx").alias("max_turn_idx"))
    n_convs = ref.count()
    mism = final.exceptAll(ref).count() + ref.exceptAll(final).count()
    if mism:
        raise AssertionError(f"stateful progress != batch aggregate: {mism} rows")
    shutil.rmtree(st_out, ignore_errors=True)
    extras["stateful_convs"] = n_convs
    extras["stateful_turns_per_sec"] = round(n_t / timings["stateful_progress"], 1)
    extras["stateful_equal_batch"] = True
    extras["curation_docs_kept"] = int(results["curation_pipeline"])
    extras["curation_docs_per_sec"] = round(
        results["curation_pipeline"] / timings["curation_pipeline"], 1
    )
    extras["span_dedup_spans"] = int(results["span_dedup"])
    fs_rep = fs_tbl.prune_report(fs_pred)
    extras["point_read_files_kept"] = fs_rep["files_kept"]
    extras["point_read_files_total"] = fs_rep["files_total"]
    extras["point_read_speedup"] = round(
        timings["point_read_full"] / timings["point_read_pruned"], 2
    )
    extras["meta_count_vs_pruned_scan"] = round(
        timings["point_read_pruned"] / max(timings["meta_count"], 1e-9), 2
    )

    shutil.rmtree(t_path, ignore_errors=True)
    shutil.rmtree(gen_path, ignore_errors=True)
    shutil.rmtree(fs_root, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # Per-round detail (loadavg + per-query times for every round) goes to a
    # SIDECAR file and an earlier stdout line — the driver tail-captures
    # stdout and parses only the FINAL line, which must stay compact (r4's
    # artifact was front-truncated and unparseable because the detail rode
    # the last line).
    detail = {"bench_rounds": ROUNDS, "rounds": rounds_meta}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_rounds.json"), "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass
    print("BENCH_ROUNDS_DETAIL " + json.dumps(detail))
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "bench_rounds": ROUNDS,
        "per_query_min_of_rounds": True,
        **extras,
    }))
    shutil.rmtree(bench_tmp_root, ignore_errors=True)


if __name__ == "__main__":
    main()
