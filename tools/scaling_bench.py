"""Scaling-efficiency evidence for the north rule: the same
parse→route→aggregate job over the SAME materialized input at two
parallelism levels (local[8] vs local[32] — the sandbox proxy for N
vs 4N executors), reporting throughput at both and the scaling
efficiency  eff = (thr_32 / thr_8) / 4.

Input is generated once to parquet (seeded, Zipf-skewed conv_ids) so
both runs read identical bytes. Each run happens in a fresh
subprocess/JVM; the timed section excludes session startup and does a
warm-up pass first. Writes BENCH.md with the table.

Usage: python tools/scaling_bench.py [n_rows] [--with-sinks]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from swarm_spark.session import get_spark
from swarm_spark.pipeline import IngestPipeline, PipelineConfig
from swarm_spark.presets import default_event_rules, default_schema_rules, default_tool_dim

cpus = {cpus}
spark = get_spark("scaling", cpus=cpus, shuffle_partitions=cpus)
cfg = PipelineConfig(default_event_rules(), default_schema_rules(),
                     warehouse={wh!r}, tool_dim=default_tool_dim(spark))
pipe = IngestPipeline(spark, cfg)
t = spark.read.parquet({inp!r})

def job():
    routed = pipe.routed(t, ingest_id="bench")
    agg = pipe.aggregate(routed)
    return agg.select(F.sum("n")).collect()[0][0]

job()  # warm-up: JIT, code cache, file footer cache
times = []
for _ in range(3):
    t0 = time.time(); n = job(); times.append(time.time() - t0)
best = min(times)
print(json.dumps({{"cpus": cpus, "sec": round(best, 3), "routed_rows": int(n),
                   "all_times": [round(x, 3) for x in times]}}))
"""


def run_one(cpus: int, inp: str) -> dict:
    wh = tempfile.mkdtemp(prefix=f"scale_wh_{cpus}_")
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, wh=wh, inp=inp)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    inp = os.environ.get("SCALING_INPUT") or os.path.join(
        tempfile.gettempdir(), f"scaling_transcripts_{n_rows}"
    )
    if not os.path.exists(inp):
        print(f"generating {n_rows:,} transcript rows -> {inp}", file=sys.stderr)
        gen = (
            "import sys; sys.path.insert(0, %r);"
            "from swarm_spark.session import get_spark;"
            "from swarm_spark.datagen import generate_transcripts;"
            "spark = get_spark('gen', cpus=32);"
            "generate_transcripts(spark, %d, seed=42).write.mode('overwrite').parquet(%r)"
            % (REPO, n_rows, inp)
        )
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1200)

    results = {}
    for cpus in (8, 32):
        print(f"running local[{cpus}] ...", file=sys.stderr)
        results[cpus] = run_one(cpus, inp)
        print(results[cpus], file=sys.stderr)

    thr8 = n_rows / results[8]["sec"]
    thr32 = n_rows / results[32]["sec"]
    eff = (thr32 / thr8) / 4.0
    summary = {
        "n_rows": n_rows,
        "local8_sec": results[8]["sec"],
        "local32_sec": results[32]["sec"],
        "thr_local8_turns_per_sec": round(thr8, 1),
        "thr_local32_turns_per_sec": round(thr32, 1),
        "scaling_efficiency": round(eff, 3),
        "routed_rows": results[32]["routed_rows"],
        "raw": results,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to
4N executors. Sandbox proxy: the identical parse->route->aggregate job
(swarm_spark.pipeline over {n_rows:,} seeded Zipf-skewed transcript
rows, same parquet input bytes) at local[8] vs local[32], fresh JVM
each, warm-up pass excluded, best of 3.

| parallelism | wall sec | throughput (turns/sec) |
|---|---|---|
| local[8]  (N)  | {results[8]["sec"]} | {thr8:,.0f} |
| local[32] (4N) | {results[32]["sec"]} | {thr32:,.0f} |

**Scaling efficiency: (thr_4N / thr_N) / 4 = {eff:.3f}**

Raw per-run times (3 runs each): local[8] {results[8]["all_times"]},
local[32] {results[32]["all_times"]}.

Reproduce: `python tools/scaling_bench.py {n_rows}`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(md)
    print("wrote BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
