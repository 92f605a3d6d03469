"""Log mining over transcript/telemetry text: template extraction and
integer-exact rate-spike detection.

The reference is a security-log pipeline (swarm routes CloudTrail-style
events, pkg/usecase/ingest.go); these are the two analytics its
operators feed downstream:

* `log_templates` — Drain-style template mining reduced to its
  shuffle-friendly core: a token containing a digit is a variable slot
  (`<*>`), everything else is template skeleton. One regexp_replace
  per row (codegen), then ONE aggregation whose shuffle moves the
  skeleton strings (small distinct set) — template tables are tiny at
  any corpus size, so the heavy work is entirely in the map-side
  partial agg.
* `hourly_spikes` — per-(key, hour) volume vs the trailing window,
  flagged with a PURE INTEGER rule: spike iff
  n * trailing_cnt > factor * trailing_sum (i.e. n > factor x trailing
  mean) and trailing_cnt >= min_history. No floats, no stddev — the
  flag is exact across engines and partitionings. The window runs over
  the ALREADY-AGGREGATED (key, hour) table (keys x hours rows, not
  corpus rows), so the sort inside each key partition is trivially
  small at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# a token with any digit is a variable slot (ids, counters, hex, args)
_SLOT_RE = r"\S*\d\S*"


def log_skeleton(col) -> Column:
    """Template skeleton: digit-bearing tokens collapsed to <*>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _SLOT_RE, "<*>")


def log_templates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(template, n_lines, example) per distinct skeleton; example is
    the lexicographic-min raw line (deterministic)."""
    return (
        df.select(log_skeleton(text_col).alias("template"), F.col(text_col))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(text_col).alias("example"),
        )
    )


def hourly_spikes(
    df: DataFrame,
    key_col: str = "tool",
    ts_col: str = "ts",
    window_hours: int = 6,
    factor: int = 2,
    min_history: int = 3,
) -> DataFrame:
    """Volume-spike flags per (key, hour): n, trailing sum/count over
    the previous `window_hours` OBSERVED hours (rows-preceding frame —
    silent hours are absent rows, matching count tables), and
    is_spike = trailing_cnt >= min_history AND
    n * trailing_cnt > factor * trailing_sum."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(-window_hours, -1)
    )
    out = counts.select(
        "key",
        "hour",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("trail_sum"),
        F.count("n").over(w).alias("trail_cnt"),
    )
    return out.withColumn(
        "is_spike",
        (F.col("trail_cnt") >= min_history)
        & (F.col("n") * F.col("trail_cnt") > factor * F.col("trail_sum")),
    )
