"""Benchmark harness — prints ONE JSON line per run.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:
  * ingest_e2e   — full parse→enrich→route→aggregate→sink-commit run
                   over transcripts derived from events (exactly-once
                   machinery included; the north_rule metric's numerator
                   is this stage's turns/sec)
  * route_agg    — routed+aggregate plan only (no sink writes)
  * gen_route_1m — 1M-row generated skewed transcripts through route+agg
                   (exercises the Zipf hot-key path at larger-than-sf
                   row counts)
  * tpch_q1, broadcast_join — generic scan/agg/join reference points

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py which shells out to this file at two
parallelism levels; see BENCH.md / BASELINE.md.
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

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # the sandbox host is shared: a noisy-neighbor spike can inflate a
    # single-shot measurement 3-5×; headline e2e numbers take the MIN
    # of two runs (fresh warehouse + batch id each — full work both
    # times, exactly-once gate not short-circuited)
    def timed_min2(name: str, mkfn):
        best, out = None, None
        for i in range(2):
            t0 = time.time()
            out = mkfn(i)()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 3)
        return out

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

    # -- ingest_e2e -------------------------------------------------
    # The pipeline's input contract is a TRANSCRIPTS table (north_star:
    # "Iceberg table of multi-turn transcripts"); the events→transcripts
    # derivation (a window shuffle) is this harness's way of building
    # that table deterministically, not part of the measured pipeline —
    # materialize it ONCE outside the timed region, then ingest from
    # the parquet-backed table like production would.
    t_path = tempfile.mkdtemp(prefix="swarm_bench_t_")
    transcripts_from_events(spark, SF_DIR).write.mode("overwrite").parquet(t_path)
    t = spark.read.parquet(t_path)
    whs = [tempfile.mkdtemp(prefix="swarm_bench_wh_") for _ in range(2)]
    try:
        res = timed_min2(
            "ingest_e2e",
            lambda i: (lambda: mkpipe(whs[i]).run(t, batch_id=f"bench{i}")),
        )
        extras["ingest_turns_per_sec"] = round(res.input_rows / timings["ingest_e2e"], 1)
        extras["ingest_input_rows"] = res.input_rows
        extras["ingest_routed_rows"] = res.routed_rows
    finally:
        for wh in whs:
            shutil.rmtree(wh, ignore_errors=True)

    # -- route_agg (plan only, count action) ------------------------
    pipe2 = mkpipe(tempfile.mkdtemp(prefix="swarm_bench_wh2_"))
    timed("route_agg", lambda: pipe2.aggregate(pipe2.routed(t)).count())
    shutil.rmtree(t_path, ignore_errors=True)

    # -- generated skewed transcripts at 1M rows --------------------
    gen = generate_transcripts(spark, GEN_ROWS, seed=42)
    timed("gen_route_1m", lambda: pipe2.aggregate(pipe2.routed(gen)).count())
    extras["gen_rows"] = GEN_ROWS
    extras["gen_turns_per_sec"] = round(GEN_ROWS / timings["gen_route_1m"], 1)

    # -- END-TO-END ingest at 1M rows (sinks+agg+audit committed):
    # amortizes the fixed per-commit costs that dominate ingest_e2e at
    # sf scale, giving the representative e2e turns/sec
    gen_path = tempfile.mkdtemp(prefix="swarm_bench_gen_")
    gen.write.mode("overwrite").parquet(gen_path)
    gen_in = spark.read.parquet(gen_path)
    wh3s = [tempfile.mkdtemp(prefix="swarm_bench_wh3_") for _ in range(2)]
    try:
        res3 = timed_min2(
            "ingest_1m_e2e",
            lambda i: (lambda: mkpipe(wh3s[i]).run(gen_in, batch_id=f"bench1m{i}")),
        )
        extras["ingest_1m_turns_per_sec"] = round(GEN_ROWS / timings["ingest_1m_e2e"], 1)
        extras["ingest_1m_routed_rows"] = res3.routed_rows
    finally:
        for wh3 in wh3s:
            shutil.rmtree(wh3, ignore_errors=True)
        shutil.rmtree(gen_path, ignore_errors=True)

    # -- generic reference queries ----------------------------------
    import __spark_entry__ as e

    timed("tpch_q1", lambda: e.q_tpch_q1(spark, SF_DIR).collect())
    timed("broadcast_join", lambda: e.q_broadcast_join(spark, SF_DIR).collect())

    # -- training-data operators (first-class at 100 TB) -------------
    # curation = exact dedup → near-dup drop → quality gate, composed;
    # minhash = LSH candidate gen + exact verify over the full corpus;
    # cosine_topk = brute-force scan top-k (quantized scorer)
    n_docs = timed_min2("curation_pipeline",
                        lambda i: (lambda: e.q_curation(spark, SF_DIR).count()))
    extras["curation_docs_kept"] = int(n_docs)
    extras["curation_docs_per_sec"] = round(n_docs / timings["curation_pipeline"], 1)
    timed_min2("minhash_dedup",
               lambda i: (lambda: e.q_minhash_pairs(spark, SF_DIR).count()))
    timed_min2("cosine_topk",
               lambda i: (lambda: e.q_cosine_topk(spark, SF_DIR).collect()))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        **extras,
    }))


if __name__ == "__main__":
    main()
