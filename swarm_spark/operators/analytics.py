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
