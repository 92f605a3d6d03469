"""Parse stage: field extraction from the transcript `text` column.

Replaces swarm's per-record JSON parse + Rego projection
(/root/reference/pkg/usecase/load.go:271-280, schema-rule eval at
load.go:210-224) with two strategies:

* ``extract_columns`` — pure JVM-side ``regexp_extract`` Column
  expressions (whole-stage-codegen'd, zero Python in the hot path).
  This is the DEFAULT and fast path.

* ``grok_extract`` — an Arrow-vectorized pandas UDF applying a
  compiled multi-pattern grok-style dictionary in one pass, for
  genuinely custom pattern sets a Column expression can't express
  (e.g. first-match-wins across N alternatives with named groups).
  The UDF compiles patterns once per executor (closure), processes
  Arrow batches — never row-at-a-time Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Patterns for the three north_star field families (FIXTURES.md §1).
RE_TOOL_CALL = r"CALL tool=([a-z0-9_]+)"
RE_TOOL_ARGS = r"CALL tool=[a-z0-9_]+ args=(\{[^}]*\})"
RE_ERROR_CODE = r"(ERR-[0-9]{4})"
RE_ACTOR = r"actor:([a-z0-9_]+)"

EXTRACT_EXPRS: dict[str, str] = {
    "called_tool": RE_TOOL_CALL,
    "call_args": RE_TOOL_ARGS,
    "error_code": RE_ERROR_CODE,
    "actor": RE_ACTOR,
}


def extract_columns(text_col: Column | str = "text") -> list[Column]:
    """JVM-side extraction columns: regexp_extract compiles once at plan
    time and runs inside WholeStageCodegen — the Spark-idiomatic
    replacement for swarm's per-record Go JSON decoding."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    out = []
    for name, pat in EXTRACT_EXPRS.items():
        c = F.regexp_extract(col, pat, 1)
        # swarm treats absent fields as null (nil-strip drops them,
        # pkg/usecase/utils.go:14-154); regexp_extract yields '' on miss.
        out.append(F.when(c != "", c).alias(name))
    return out


def with_extracted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the extracted event-field columns to a transcript DF."""
    return df.select("*", *extract_columns(text_col))


# ---------------------------------------------------------------------------
# Arrow-vectorized grok path (custom pattern dictionaries).
# ---------------------------------------------------------------------------

GROK_RESULT_TYPE = T.StructType(
    [
        T.StructField("called_tool", T.StringType()),
        T.StructField("call_args", T.StringType()),
        T.StructField("error_code", T.StringType()),
        T.StructField("actor", T.StringType()),
    ]
)


def make_grok_udf(patterns: dict[str, str] | None = None):
    """Build a pandas UDF extracting every pattern in one vectorized
    pass per Arrow batch. Patterns compile once per executor process.

    pandas' ``str.extract`` is C-vectorized over the whole batch —
    no per-row Python function calls.
    """
    patterns = patterns or EXTRACT_EXPRS
    fields = [T.StructField(k, T.StringType()) for k in patterns]
    result_type = T.StructType(fields)

    compiled = {k: re.compile(p) for k, p in patterns.items()}

    @F.pandas_udf(result_type)
    def grok(texts: pd.Series) -> pd.DataFrame:
        out = {}
        for name, rx in compiled.items():
            # one C-level vectorized pass per pattern over the batch
            extracted = texts.str.extract(rx, expand=True)
            out[name] = extracted.iloc[:, 0]
        return pd.DataFrame(out)

    return grok


def with_grok(df: DataFrame, text_col: str = "text",
              patterns: dict[str, str] | None = None) -> DataFrame:
    """Custom-pattern variant of ``with_extracted`` (Arrow batched)."""
    grok = make_grok_udf(patterns)
    keys = list((patterns or EXTRACT_EXPRS).keys())
    tmp = df.withColumn("_g", grok(F.col(text_col)))
    return tmp.select("*", *[F.col(f"_g.{k}").alias(k) for k in keys]).drop("_g")
