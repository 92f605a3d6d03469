"""Capture .explain('formatted') for the round-6-touched queries.

Usage:  python tools/capture_plans_r6.py <out_dir> [suffix]

Writes <out_dir>/<query>_<suffix>.txt for each touched query plus the
ingest staged-write plan. Run once in a round-start worktree with
suffix=before and once on the optimized tree with suffix=after.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(out_dir, exist_ok=True)

    from swarm_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("plans_r6", cpus=8, shuffle_partitions=8)

    names = [
        "minhash_pairs", "dedup_minhash_keep", "span_dedup", "curation",
        "cosine_topk", "quality_model", "semantic_dedup", "pq_ann",
        "kmeans", "simhash_pairs", "bloom_point_read", "merge_upsert",
        "mixture", "tpch_q1", "broadcast_join",
    ]
    for name in names:
        fn = getattr(e, f"q_{name}")
        try:
            txt = explain_str(fn(spark, SF_DIR))
        except Exception as ex:  # pragma: no cover
            txt = f"ERROR building plan: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print("captured", name)

    # ingest: the routed plan and the staged-write input plan
    import tempfile

    from swarm_spark.datagen import transcripts_from_events
    from swarm_spark.pipeline import (PAYLOAD_FIELDS, IngestPipeline,
                                      PipelineConfig)
    from swarm_spark.presets import (default_event_rules,
                                     default_schema_rules, default_tool_dim)
    from swarm_spark.tablestore import _PART_FMT
    import pyspark.sql.functions as F

    t_path = tempfile.mkdtemp(prefix="plans_t_")
    transcripts_from_events(spark, SF_DIR).write.mode("overwrite").parquet(t_path)
    t = spark.read.parquet(t_path)
    cfg = PipelineConfig(
        event_rules=default_event_rules(), schema_rules=default_schema_rules(),
        warehouse=tempfile.mkdtemp(prefix="plans_wh_"),
        tool_dim=default_tool_dim(spark))
    p = IngestPipeline(spark, cfg)
    routed = p.routed(t, ingest_id="plans")
    with open(os.path.join(out_dir, f"ingest_routed_{suffix}.txt"), "w") as fh:
        fh.write(explain_str(routed))
    staged = routed.filter(F.col("sink_table").isNotNull()) \
        .withColumn("_sink", F.col("sink_table"))
    out_cols = [F.col(c) for c in
                ["id", "ingest_id", "timestamp", "ingested_at"]
                + [c for c in PAYLOAD_FIELDS if c in routed.columns]]
    pcol = F.lit(None).cast("string")
    for r in cfg.schema_rules:
        if r.partition_unit:
            pcol = F.when(F.col("_sink") == r.sink_table,
                          F.date_format("timestamp", _PART_FMT[r.partition_unit])
                          ).otherwise(pcol)
    staged = staged.select("_sink", *out_cols).withColumn("_p", pcol)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s2 = staged.repartition(n, F.col("_sink"), F.col("_p")) \
        .sortWithinPartitions("_sink", "_p", "conv_id", "turn_idx")
    with open(os.path.join(out_dir, f"ingest_staged_write_{suffix}.txt"), "w") as fh:
        fh.write(explain_str(s2))
    print("captured ingest plans")


if __name__ == "__main__":
    main()
