"""Event-stream analytics downstream of the log pipeline: funnel
conversion and cohort retention.

These are the canonical consumers of a routed telemetry table
(reference analogue: the BigQuery queries swarm's sinks exist to
serve — the pipeline lands events so somebody can ask "how many users
reached purchase?"). Both reduce the corpus to entity-level rows in
ONE keyed aggregation before anything else happens, so the expensive
shuffle moves (entity, small-aggregate) pairs and the analytics
themselves run over entity-count-sized data:

* `funnel_counts` — per-entity min-timestamp per step (conditional
  aggregates, one groupBy), then ordered-progression counts: an entity
  reaches step k iff every step <= k has an event and the min
  timestamps are strictly increasing. Output is (step_idx, step,
  n_entities) — pure integers.
* `cohort_retention` — cohort = period of the entity's FIRST event;
  the (cohort, period) matrix counts distinct active entities at each
  period offset. Offsets are integer day-diffs divided by the period
  length — no float date math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: n_entities whose step timestamps
    strictly increase through the prefix ending at each step."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    aggs = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
        for i, s in enumerate(steps)
    ]
    per_entity = df.groupBy(entity_col).agg(*aggs)
    conds = [F.col("_t0").isNotNull()]
    for i in range(1, len(steps)):
        conds.append(
            conds[i - 1]
            & F.col(f"_t{i}").isNotNull()
            & (F.col(f"_t{i}") > F.col(f"_t{i - 1}"))
        )
    one = per_entity.agg(
        *[F.sum(c.cast("long")).alias(f"_n{i}") for i, c in enumerate(conds)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_entities"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select("_r.*")


def cohort_retention(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix: (cohort, period_offset, n_entities) where
    cohort = period-truncated first-event time and period_offset counts
    periods since the cohort (0 = the cohort period itself)."""
    days = {"day": 1, "week": 7}[period]
    # ONE corpus-sized shuffle: cohort (min ts) and the entity's
    # distinct active periods ride the same entity-keyed aggregation
    # (collect_set is bounded by periods-per-entity, i.e. tens, not by
    # event count). The explode and final matrix agg then run over
    # entity x active-period rows — entity-count-sized data.
    per_entity = df.groupBy(entity_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort"),
        F.collect_set(F.date_trunc(period, F.col(ts_col))).alias("_ps"),
    )
    exploded = per_entity.select(
        entity_col, "cohort", F.explode("_ps").alias("_p"))
    return (
        exploded.groupBy(
            "cohort",
            (F.datediff(F.col("_p"), F.col("cohort")) / days)
            .cast("int")
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx_rsd: float = 0.05) -> DataFrame:
    """Dataset profile: one row per column with exact counts/extremes
    and sketch-based distinct estimates —

        (column, dtype, n, n_null, approx_distinct, min_s, max_s)

    Everything rides ONE aggregation (a single-row agg of composed
    expressions, reshaped to long format driver-free via explode), so
    profiling a 100 TB table costs one scan with map-side-combinable
    partial aggregates; approx_count_distinct is an HLL++ sketch that
    merges associatively across partitions. min/max are computed in
    the column's NATIVE type (numeric order for numbers) and cast to
    string only for display. n/n_null/min/max are exact (oracle-able);
    the distinct estimate carries the rsd tolerance."""
    cols = columns or [f.name for f in df.schema.fields]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__ad_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.lit(types[c]).alias("dtype"),
            F.col(f"__n_{c}").alias("n"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__ad_{c}").alias("approx_distinct"),
            F.col(f"__mn_{c}").alias("min_s"),
            F.col(f"__mx_{c}").alias("max_s"),
        )
        for c in cols
    ])
    return one.select(F.explode(rows).alias("_r")).select("_r.*")
