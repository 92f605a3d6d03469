"""Dedup scaling probe at 10× the r2 measurement (500k docs).

Builds the probe corpus IN SPARK from dist/sf1's 50k documents:
K-1 extra copies with shifted ids and a token mutation at positions
j % 3 == 1 (JVM-side transform). gen_sf.py already mutated positions
j % 3 == 0 to differentiate sf1's own sub-copies, so the probe MUST
use a different residue class: mutating the same positions would
overwrite exactly the tokens that distinguish sf1's sub-copies and
collapse each probe copy into 10-way identical duplicate groups
(measured: 94,848/500,000 unique, ~2.3M planted J=1 pairs — kept in
SCALE.md as the dup-heavy STRESS variant, reproducible with
--collide). With the offset class, every 3-shingle spans both a
probe-mutated and a gen_sf-mutated position, so cross-copy overlap
stays zero AND sub-copy distinctions survive: pair counts scale
linearly with K. Measures the corpus-scale strategies only —
the exact inverted-index path is guarded out above 100k docs by
design (SCALE.md):

  * exact dedup (md5 groupBy)     expect ~linear
  * MinHash+LSH verify J>=0.8     expect ~2x wall per 10x docs
  * SimHash h<=3 (hot-bucket guard auto-on at this size)

Also the codegen-width check the r2 verdict asked for: stderr of this
run must contain NO whole-stage-codegen fallback warnings from the
simhash one-pass vote aggregate (grep for 'codegen' / 'grows beyond'
in the captured stderr — the run script does this).

Usage: python tools/dedup_probe.py [--copies 10] [--src dist/sf1]
Prints one JSON line per strategy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, src: str, copies: int, collide: bool = False):
    docs = spark.read.parquet(f"{src}/documents.parquet")
    stride = 1_000_000_000  # far above any real doc_id
    residue = 0 if collide else 1  # 0 reproduces the dup-heavy stress shape
    parts = [docs]
    for i in range(1, copies):
        toks = F.split(F.col("text"), " ")
        mutated = F.array_join(
            F.transform(
                toks,
                lambda t, j: F.when(
                    j % 3 == residue, F.concat(F.lit(f"p{i}x"), j.cast("string"))
                ).otherwise(t),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"),
                mutated.alias("text"),
                "lang", "source",
                F.length(mutated).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="dist/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--collide", action="store_true",
                    help="reproduce the dup-heavy stress corpus (collapsed copies)")
    args = ap.parse_args()

    from swarm_spark.session import get_spark

    spark = get_spark("dedup_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    from pyspark import StorageLevel

    corpus = build_corpus(spark, args.src, args.copies, collide=args.collide).persist(
        StorageLevel.MEMORY_AND_DISK)
    n = corpus.count()
    print(json.dumps({"probe": "corpus", "docs": n, "copies": args.copies}))

    from swarm_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    t0 = time.time()
    kept = dedup_exact(corpus).count()
    print(json.dumps({"probe": "exact_dedup", "wall_sec": round(time.time() - t0, 1),
                      "kept": kept}))

    t0 = time.time()
    pairs = minhash_lsh_pairs(corpus, num_hashes=128, bands=16)
    n_pairs = pairs.filter(F.col("jaccard") >= 0.8).count()
    print(json.dumps({"probe": "minhash_lsh_J08", "wall_sec": round(time.time() - t0, 1),
                      "pairs": n_pairs}))

    t0 = time.time()
    sp = simhash_pairs(corpus, max_hamming=3, n_docs=n)  # guard auto-on >100k
    n_sp = sp.count()
    print(json.dumps({"probe": "simhash_h3_guarded", "wall_sec": round(time.time() - t0, 1),
                      "pairs": n_sp}))


if __name__ == "__main__":
    main()
