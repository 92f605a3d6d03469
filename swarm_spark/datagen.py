"""Deterministic transcript-table generation.

Two producers of the `input_hint` schema
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``:

1. ``generate_transcripts(spark, n_turns, ...)`` — a scale generator
   built purely from ``spark.range`` + hash-derived column expressions
   (no rand(), no Python rows): fully deterministic for a given seed,
   embarrassingly parallel, Zipf-skewed conv_id hot keys to exercise
   the salting/AQE path. This is what bench and the 10^12-turn design
   target use.

2. ``transcripts_from_events(spark, sf_dir)`` — derives transcripts
   from the driver-generated ``events`` parquet with *SQL-expressible*
   transforms only, paired with ``TRANSCRIPTS_FROM_EVENTS_SQL`` (the
   exact DuckDB equivalent) so every downstream pipeline stage is
   oracle-checkable end to end.

The embedded text patterns (``CALL tool=... args=...``, ``ERR-\\d{4}``,
``actor:[a-z0-9_]+``) are the extraction targets of the parse stage
(BASELINE.json north_star), standing in for the JSON field extraction
swarm performs per record (/root/reference/pkg/usecase/load.go:271-280).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z

TOOLS = ["search", "browser", "python", "bash", "sql", "calc", "mail", "files"]
ACTORS = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]


def _u01(col, seed: int):
    """Deterministic uniform [0,1) from a column — hash, not rand()."""
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_convs: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded, skewed, fully-parallel transcript generator.

    conv assignment follows an approximate Zipf(1): conv rank
    ``floor(n_convs ** u)`` for uniform u, so rank-0 conversations own
    ~``1/ln(n_convs)`` of all turns — the hot-key workload the
    north_rule's skew handling must absorb.

    turn_idx is assigned with a window over (conv_id ORDER BY id);
    ts increases with global id, hence monotone within a conversation
    (FIXTURES.md §1 invariant).
    """
    n_convs = n_convs or max(n_turns // 64, 1)
    base = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)

    u_conv = _u01(F.col("id"), seed)
    conv_rank = F.floor(F.pow(F.lit(float(n_convs)), u_conv)) - 1
    conv_rank = F.least(conv_rank, F.lit(n_convs - 1)).cast("long")

    r_role = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(100))
    role = (
        F.when(r_role < 40, "user")
        .when(r_role < 78, "assistant")
        .when(r_role < 88, "system")
        .otherwise("tool")
    )

    tool_arr = F.array(*[F.lit(t) for t in TOOLS])
    actor_arr = F.array(*[F.lit(a) for a in ACTORS])
    tool_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(len(TOOLS)))
    actor_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(len(ACTORS)))
    has_call = (role.isin("assistant", "tool")) & (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 4)), F.lit(10)) < 4
    )
    has_err = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 5)), F.lit(10)) < 1
    err_code = F.format_string(
        "ERR-%04d", F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 6)), F.lit(10000))
    )
    tool = F.when(has_call, F.element_at(tool_arr, (tool_idx + 1).cast("int")))
    actor = F.element_at(actor_arr, (actor_idx + 1).cast("int"))

    text = F.concat(
        F.lit("turn "),
        F.col("id").cast("string"),
        F.lit(" actor:"),
        actor,
        F.when(
            has_call,
            F.concat(
                F.lit(" CALL tool="),
                tool,
                F.lit(' args={"q":'),
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 7)), F.lit(1000)).cast("string"),
                F.lit("}"),
            ),
        ).otherwise(F.lit("")),
        F.when(has_err, F.concat(F.lit(" "), err_code)).otherwise(F.lit("")),
        F.lit(" body "),
        F.repeat(F.lit("lorem ipsum dolor sit amet "),
                 (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 8)), F.lit(5)) + 1).cast("int")),
    )

    df = base.select(
        F.concat(F.lit("conv-"), F.lpad(conv_rank.cast("string"), 8, "0")).alias("conv_id"),
        F.col("id").alias("_gid"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") * 7).alias("ts"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("_gid")
    return df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int")).drop("_gid").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


# ---------------------------------------------------------------------------
# Oracle-checkable derivation from the driver's `events` parquet.
# The Spark builder below and TRANSCRIPTS_FROM_EVENTS_SQL MUST stay in
# lockstep — tests assert their equality via DuckDB.
# ---------------------------------------------------------------------------

_ROLE_CASE = """CASE event_type
        WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
        WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
        ELSE 'tool' END"""

_TOOL_CASE = """CASE WHEN event_type IN ('purchase', 'signup')
        THEN concat(event_type, '_svc')
        WHEN event_type = 'error' THEN 'error_reporter'
        ELSE NULL END"""

_TEXT_EXPR = """concat(
      'evt ', CAST(event_id AS VARCHAR),
      ' actor:u', CAST(user_id AS VARCHAR),
      CASE WHEN event_type IN ('purchase', 'signup')
           THEN concat(' CALL tool=', event_type, '_svc args={"q":',
                       CAST(event_id % 1000 AS VARCHAR), '}')
           ELSE '' END,
      CASE WHEN event_type = 'error'
           THEN concat(' ERR-', lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0'))
           ELSE '' END,
      ' type=', event_type)"""

TRANSCRIPTS_FROM_EVENTS_SQL = f"""
  SELECT concat('conv-', CAST(user_id AS VARCHAR)) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
         {_ROLE_CASE} AS role,
         {_TEXT_EXPR} AS text,
         {_TOOL_CASE} AS tool,
         ts
  FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of TRANSCRIPTS_FROM_EVENTS_SQL (DuckDB/ANSI dialect
    is compatible with Spark SQL for every construct used)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    sql = TRANSCRIPTS_FROM_EVENTS_SQL.replace("AS VARCHAR", "AS STRING")
    return spark.sql(sql)
