"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse→enrich→route→aggregate pipeline
over transcripts derived deterministically from the sf0.001 events
table. `queries()` exposes each implemented operator (SURVEY.md §2)
as (spark, sf_dir) -> DataFrame, and `oracle_sql()` gives DuckDB
equivalents over the same parquet views.

The `transcripts` input (BASELINE.json input_hint) is derived from the
`events` view with SQL-expressible transforms (swarm_spark.datagen.
TRANSCRIPTS_FROM_EVENTS_SQL) so BOTH engines compute it identically —
every pipeline stage is therefore value-checked end to end.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from swarm_spark.datagen import (  # noqa: E402
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)
from swarm_spark.pipeline import IngestPipeline, PipelineConfig  # noqa: E402
from swarm_spark.presets import (  # noqa: E402
    default_event_rules,
    default_schema_rules,
    default_tool_dim,
)

# ---------------------------------------------------------------------------
# shared plan builders
# ---------------------------------------------------------------------------


def _pipeline(spark: SparkSession, warehouse: str | None = None) -> IngestPipeline:
    import tempfile

    cfg = PipelineConfig(
        event_rules=default_event_rules(),
        schema_rules=default_schema_rules(),
        warehouse=warehouse or tempfile.mkdtemp(prefix="swarm_wh_"),
        tool_dim=default_tool_dim(spark),
    )
    return IngestPipeline(spark, cfg)


def _routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    return _pipeline(spark).routed(t)


ROUTE_COLS = ["conv_id", "turn_idx", "role", "schema_name", "sink_table",
              "called_tool", "error_code", "actor", "tool_family"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/T1-T3: vectorized regex extraction (JVM regexp_extract)."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    return p.select("conv_id", "turn_idx", "role", "tool",
                    "called_tool", "call_args", "error_code", "actor")


def q_turn_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star ordering window: row_number over (conv_id, turn_idx)."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    return p.select("conv_id", "turn_idx", "turn_seq", "prev_role", "text")


def q_pipeline_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/R1: event-rule fan-out + broadcast schema/tool enrichment."""
    return _routed(spark, sf_dir).select(*ROUTE_COLS)


def q_pipeline_agg_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: counts per (sink, role, tool, hour)."""
    r = _routed(spark, sf_dir)
    return _pipeline(spark).aggregate(r)


def q_routed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: deterministic content-hash id — md5 of the canonical payload
    projection (types.go:27-34). Uses an explicit field list so the
    oracle can rebuild the exact JSON string."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    payload_json = F.to_json(F.struct("conv_id", "turn_idx", "role"))
    return p.select(
        "conv_id", "turn_idx",
        F.md5(payload_json).alias("row_id"),
    )


def q_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-sink log counts (the per-dest IngestLog.LogCount)."""
    r = _routed(spark, sf_dir)
    return r.groupBy(F.col("sink_table").alias("sink")).agg(
        F.count(F.lit(1)).alias("log_count")
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic agg benchmark (pricing summary) on lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: orders ⋈ customer ⋈ nation (dim side tiny)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "parse_extract": q_parse_extract,
    "turn_ordering": q_turn_ordering,
    "pipeline_route": q_pipeline_route,
    "pipeline_agg_hourly": q_pipeline_agg_hourly,
    "routed_ids": q_routed_ids,
    "sink_counts": q_sink_counts,
    "tpch_q1": q_tpch_q1,
    "broadcast_join": q_broadcast_join,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full route+aggregate over sf0.001-derived transcripts."""
    return q_pipeline_agg_hourly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_T = TRANSCRIPTS_FROM_EVENTS_SQL

_PARSED = f"""
transcripts AS ({_T}),
parsed AS (
  SELECT *,
    nullif(regexp_extract(text, 'CALL tool=([a-z0-9_]+)', 1), '') AS called_tool,
    nullif(regexp_extract(text, 'CALL tool=[a-z0-9_]+ args=(\\{{[^}}]*\\}})', 1), '') AS call_args,
    nullif(regexp_extract(text, '(ERR-[0-9]{{4}})', 1), '') AS error_code,
    nullif(regexp_extract(text, 'actor:([a-z0-9_]+)', 1), '') AS actor
  FROM transcripts)
"""

_TOOL_DIM = """
tool_dim AS (
  SELECT * FROM (VALUES
    ('search','retrieval',false),('browser','retrieval',false),
    ('python','execution',true),('bash','execution',true),
    ('sql','execution',true),('calc','compute',false),
    ('mail','comms',true),('files','storage',true),
    ('purchase_svc','commerce',true),('signup_svc','identity',false),
    ('error_reporter','telemetry',false)
  ) AS t(tool, tool_family, is_privileged))
"""

_ROUTED = f"""
{_PARSED},
{_TOOL_DIM.lstrip()},
matched AS (
  SELECT p.*, b.schema_name, b.sink_table
  FROM parsed p
  JOIN (VALUES
    ('error_events','sink_errors'), ('tool_calls','sink_tools'),
    ('assistant_log','sink_assistant'), ('user_log','sink_user')
  ) AS b(schema_name, sink_table)
  ON (b.schema_name = 'error_events' AND p.error_code LIKE 'ERR-%')
   OR (b.schema_name = 'tool_calls' AND p.called_tool IS NOT NULL)
   OR (b.schema_name = 'assistant_log' AND p.role = 'assistant')
   OR (b.schema_name = 'user_log' AND p.role = 'user')),
routed AS (
  SELECT m.*, d.tool_family, d.is_privileged
  FROM matched m LEFT JOIN tool_dim d
  ON coalesce(m.called_tool, m.tool) = d.tool)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "parse_extract": f"""
            WITH {_PARSED.lstrip()}
            SELECT conv_id, turn_idx, role, tool, called_tool, call_args,
                   error_code, actor
            FROM parsed
        """,
        "turn_ordering": f"""
            WITH transcripts AS ({_T})
            SELECT conv_id, turn_idx,
                   CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS turn_seq,
                   lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
                   text
            FROM transcripts
        """,
        "pipeline_route": f"""
            WITH {_ROUTED.lstrip()}
            SELECT conv_id, turn_idx, role, schema_name, sink_table,
                   called_tool, error_code, actor, tool_family
            FROM routed
        """,
        "pipeline_agg_hourly": f"""
            WITH {_ROUTED.lstrip()}
            SELECT sink_table AS sink, role,
                   coalesce(called_tool, tool) AS tool,
                   date_trunc('hour', ts) AS hour,
                   count(*) AS n
            FROM routed
            GROUP BY 1, 2, 3, 4
        """,
        "routed_ids": f"""
            WITH transcripts AS ({_T})
            SELECT conv_id, turn_idx,
                   md5(concat('{{"conv_id":"', conv_id,
                              '","turn_idx":', CAST(turn_idx AS VARCHAR),
                              ',"role":"', role, '"}}')) AS row_id
            FROM transcripts
        """,
        "sink_counts": f"""
            WITH {_ROUTED.lstrip()}
            SELECT sink_table AS sink, count(*) AS log_count
            FROM routed GROUP BY 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   avg(l_quantity) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "broadcast_join": """
            SELECT n_name, count(*) AS n_orders, sum(o_totalprice) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }
