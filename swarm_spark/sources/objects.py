"""JSON object ingestion — the rebuild of swarm's download→decompress→
parse stage (S1/S4/S5).

swarm reads a whole GCS object, optionally gunzips it, and decodes a
SEQUENCE of JSON documents with a json.Decoder loop
(/root/reference/pkg/usecase/load.go:262-280) — so it accepts NDJSON,
concatenated documents (`{..}{..}`), and single documents alike, then
schema rules may explode one document into many records (CloudTrail's
{Records:[...]}, pkg/usecase/testdata/policy/schema.rego:3-12).

Spark mapping:
  * NDJSON / single-doc         → spark.read.json (built-in; .gz codec
                                   handled transparently = S4)
  * concatenated multi-doc      → wholetext scan + an Arrow-batched
                                   raw_decode loop (the one genuinely
                                   sequential parse), then explode
  * 1→N record explode          → explode() on the records array
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """NDJSON (and single-doc-per-file via multiLine fallback); gzip
    transparent. Provide a schema in production — inference scans."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_multidoc_json(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Concatenated/streamed JSON documents: each FILE may hold any
    mix of whitespace-separated or back-to-back JSON values. Returns
    (path string, doc string) — one row per decoded document, each
    re-serialized compactly for downstream from_json.

    The decoder loop runs per Arrow batch over whole files — the exact
    semantic of swarm's json.Decoder `More()` loop (load.go:271-280).
    Files must fit in memory individually (same constraint as the
    reference, which buffers per object)."""
    if isinstance(path, str) and "," in path:
        path = path.split(",")
    whole = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = json.JSONDecoder()
        for pdf in batches:
            out_path, out_doc, out_ord = [], [], []
            for p, text in zip(pdf["path"], pdf["value"]):
                idx, n, ordinal = 0, len(text), 0
                while idx < n:
                    while idx < n and text[idx] in " \t\r\n":
                        idx += 1
                    if idx >= n:
                        break
                    val, idx = dec.raw_decode(text, idx)
                    out_path.append(p)
                    out_doc.append(json.dumps(val, separators=(",", ":")))
                    out_ord.append(ordinal)
                    ordinal += 1
            yield pd.DataFrame({"path": out_path, "doc": out_doc, "ordinal": out_ord})

    return whole.mapInPandas(decode, schema="path string, doc string, ordinal int")


def explode_records(df: DataFrame, doc_col: str = "doc",
                    records_field: str = "Records") -> DataFrame:
    """1→N record explode for batch documents ({Records:[...]} shape):
    documents WITH the array fan out one row per element; documents
    WITHOUT it pass through unchanged — mirroring a schema rule that
    emits `input.Records[_]` vs one that emits the document itself
    (testdata/policy/schema.rego:3-12).

    Implemented as an Arrow-batched re-serialization (JSON array
    elements must come out as raw JSON strings, which from_json cannot
    produce for object elements); the explode itself is a JVM
    explode() over the produced array."""

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc in pdf[doc_col]:
                try:
                    v = json.loads(doc)
                except (ValueError, TypeError):
                    recs.append([doc])
                    continue
                if isinstance(v, dict) and isinstance(v.get(records_field), list):
                    recs.append([
                        json.dumps(e, separators=(",", ":")) for e in v[records_field]
                    ])
                else:
                    recs.append([doc])
            yield pdf.assign(_recs=recs)

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    with_arr = df.mapInPandas(split_records, schema=f"{fields}, _recs array<string>")
    return with_arr.withColumn("record", F.explode("_recs")).drop("_recs")
