"""Measure the JSON coverage-check floor and the key-set-signature
alternative (NOTES_r4 round-5 candidate #1).

Three timed variants over the SAME 1M-doc CloudTrail-shaped JSON input
(materialized to parquet first so generation is outside every timing):

  parse_only   — the output projection alone (from_json + field select):
                 the floor any ingest pays.
  current      — parse + the shipped _residual_predicate
                 (nulls_stripped membership + typed-null conflicts on
                 the hoisted parse) as an Observation-style sum.
  signature    — parse + key-set-signature novelty ONLY:
                 xxhash64(concat_ws(sort_array(json_object_keys))) for
                 the top level and each struct path, isin(known sigs).
                 WEAKER guarantee: value-level type conflicts are NOT
                 flagged (a long field receiving "abc" sails through);
                 measures the best case the idea could buy.

Usage: python tools/coverage_probe.py [n_docs] [cpus] [rounds]
Prints one JSON line with min seconds per variant and the derived
coverage shares.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from swarm_spark.pipeline_json import _residual_predicate

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("coverage_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="covprobe_")
    src = os.path.join(tmp, "docs")
    doc = F.to_json(
        F.struct(
            F.col("id").cast("string").alias("eventID"),
            F.concat(
                F.lit("2024-01-01T00:"),
                F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                F.lit(":00Z"),
            ).alias("eventTime"),
            F.concat(F.lit("ev"), (F.col("id") % 7).cast("string")).alias("eventName"),
            F.struct(
                F.concat(F.lit("u"), (F.col("id") % 997).cast("string")).alias("userName"),
                F.concat(F.lit("arn:"), (F.col("id") % 13).cast("string")).alias("arn"),
            ).alias("userIdentity"),
            (F.col("id") % 100).alias("readOnly"),
        )
    )
    spark.range(n).select(F.col("id"), doc.alias("data")).write.mode(
        "overwrite"
    ).parquet(src)
    docs = spark.read.parquet(src)

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("eventID", StringType()),
            StructField("eventTime", StringType()),
            StructField("eventName", StringType()),
            StructField(
                "userIdentity",
                StructType(
                    [StructField("userName", StringType()), StructField("arn", StringType())]
                ),
            ),
            StructField("readOnly", LongType()),
        ]
    )

    def parse_only():
        staged = docs.select("id", F.from_json("data", schema).alias("_parsed"))
        return staged.select(
            F.sum(F.length(F.col("_parsed.eventID")) + F.col("_parsed.readOnly"))
        ).collect()

    def current():
        staged = docs.select("id", "data", F.from_json("data", schema).alias("_parsed"))
        flagged = staged.select(
            "_parsed",
            _residual_predicate(
                "data", schema, nulls_stripped=True, parsed_col=F.col("_parsed")
            ).cast("long").alias("_m"),
        )
        return flagged.select(
            F.sum(F.length(F.col("_parsed.eventID")) + F.col("_parsed.readOnly")),
            F.sum("_m"),
        ).collect()

    def signature():
        top_sig = F.xxhash64(F.concat_ws(",", F.sort_array(F.json_object_keys("data"))))
        ui_sig = F.xxhash64(
            F.concat_ws(
                ",",
                F.sort_array(F.json_object_keys(F.get_json_object("data", "$.userIdentity"))),
            )
        )
        # known signatures: computed once from the sampled inference
        # batch in the real design; literals here
        known_top = [r[0] for r in docs.limit(1).select(top_sig).collect()]
        known_ui = [r[0] for r in docs.limit(1).select(ui_sig).collect()]
        staged = docs.select("id", "data", F.from_json("data", schema).alias("_parsed"))
        novel = (~top_sig.isin(known_top)) | (~ui_sig.isin(known_ui))
        flagged = staged.select("_parsed", novel.cast("long").alias("_m"))
        return flagged.select(
            F.sum(F.length(F.col("_parsed.eventID")) + F.col("_parsed.readOnly")),
            F.sum("_m"),
        ).collect()

    variants = {"parse_only": parse_only, "current": current, "signature": signature}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for fn in variants.values():  # warm-up (codegen, file listing)
        fn()
    for _ in range(rounds):
        for name, fn in variants.items():  # interleaved rounds
            t0 = time.monotonic()
            fn()
            times[name].append(time.monotonic() - t0)

    mins = {k: min(v) for k, v in times.items()}
    out = {
        "n_docs": n,
        "cpus": cpus,
        "rounds": rounds,
        "loadavg": os.getloadavg()[0],
        "sec_min": {k: round(v, 3) for k, v in mins.items()},
        "sec_all": {k: [round(x, 3) for x in v] for k, v in times.items()},
        "coverage_share_current": round(
            (mins["current"] - mins["parse_only"]) / mins["current"], 4
        ),
        "coverage_share_signature": round(
            (mins["signature"] - mins["parse_only"]) / mins["signature"], 4
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
