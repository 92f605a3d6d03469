"""Slowly-changing-dimension Type 2 maintenance over icepack tables.

The latest-state MERGE (tablestore.merge_upsert) loses history; a
training-data / analytics deployment usually needs BOTH: "what is this
entity now" and "what was it when the batch ran" (point-in-time joins
for feature backfills, auditability for governance). SCD2 is the
standard answer: each business key carries versioned rows
(_valid_from, _valid_to), the current version has _valid_to IS NULL,
and an update CLOSES the current version and INSERTS a new one.

Spark-first shape: `scd2_delta` is a pure DataFrame→DataFrame
computation (one join of the CURRENT slice against the batch — the
batch side broadcasts, the history is never shuffled), and
`scd2_upsert` lands the delta through `merge_upsert` keyed on
(business key, _valid_from) — version rows are immutable once closed,
so the delta only ever touches the files holding each key's CURRENT
version, and the dir-scoped CoW merge machinery (range + key-bisect
file pruning, conflict-checked commit, mor-mask folding) applies
unchanged. At 100 TB an SCD2 batch costs O(affected files), exactly
like the latest-state merge.

Semantics (the Kimball Type 2 contract):
* an update whose tracked attributes EQUAL the current version is a
  no-op (no churn rows);
* a changed update closes the current version at `ts` and opens a new
  one [ts, null);
* a brand-new key opens its first version [ts, null);
* NULL attribute values compare with null-safe equality (NULL == NULL
  is "unchanged" — SQL DISTINCT semantics);
* multiple versions of one key never overlap by construction.

Reference analogue: the reference's BigQuery sinks are append-only
logs (pkg/infra/bq/client.go) — SCD2 is the lakehouse-side completion
for mutable dimensions whose history must stay queryable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_delta", "scd2_upsert", "scd2_current", "scd2_as_of"]

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"


def scd2_delta(history: DataFrame, updates: DataFrame, keys: list[str],
               attrs: list[str], ts) -> DataFrame:
    """The version rows an update batch produces against `history`
    (full SCD2 relation): closed current versions + new versions.
    `ts` is the batch's effective timestamp (a literal or Column).
    Pure plan — callers land it via scd2_upsert or their own writer.

    One join: current slice ⋈ updates on keys. Change detection is
    null-safe per attribute. Unchanged keys emit NOTHING."""
    ts_lit = ts if isinstance(ts, Column) else F.lit(ts)
    cur = history.filter(F.col(VALID_TO).isNull())
    upd = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
    )
    joined = cur.join(upd, keys, "inner")
    changed = joined.filter(
        ~F.expr(" AND ".join(
            f"({a} <=> _new_{a})" for a in attrs)) if attrs else F.lit(False))
    closed = changed.select(
        *keys, *attrs, F.col(VALID_FROM),
        ts_lit.cast("timestamp").alias(VALID_TO))
    opened = changed.select(
        *keys, *[F.col(f"_new_{a}").alias(a) for a in attrs],
        ts_lit.cast("timestamp").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO))
    fresh = (upd.join(cur.select(*keys), keys, "left_anti")
             .select(*keys, *[F.col(f"_new_{a}").alias(a) for a in attrs],
                     ts_lit.cast("timestamp").alias(VALID_FROM),
                     F.lit(None).cast("timestamp").alias(VALID_TO)))
    return closed.unionByName(opened).unionByName(fresh)


def scd2_upsert(spark, table, updates: DataFrame, keys: list[str],
                attrs: list[str], ts) -> dict:
    """Apply one update batch to an icepack SCD2 table. The delta's
    closed rows REPLACE the current-version rows they version (same
    (keys, _valid_from)), the opened/fresh rows are inserts — so the
    whole batch lands through ONE dir-scoped merge_upsert commit, with
    its conflict semantics (concurrent appends abort-and-recompute).
    First batch on an empty table just inserts initial versions.

    The batch must carry ONE row per business key (the Kimball batch
    contract — two versions cannot share an effective timestamp);
    duplicates would open overlapping current versions, so they are
    rejected with one batch-sized aggregate before any write."""
    dup = updates.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
        .alias("d")).first()["d"]
    if dup:
        raise ValueError(
            f"scd2_upsert: batch has {dup} duplicate business-key rows — "
            f"one row per key per batch (versions cannot overlap)")
    if not table.exists():
        first = updates.select(
            *keys, *attrs,
            (ts if isinstance(ts, Column) else F.lit(ts))
            .cast("timestamp").alias(VALID_FROM),
            F.lit(None).cast("timestamp").alias(VALID_TO))
        return table.append(first)

    # The delta is rebuilt from a FRESH read on every merge attempt
    # (merge_upsert rebuild=): a concurrent batch landing between our
    # read and the commit makes the commit conflict, and the retry
    # recomputes the delta against the new CURRENT instead of
    # re-committing a stale one (overlapping-version hazard,
    # r5-advice fix).
    def _delta() -> DataFrame:
        return scd2_delta(table.read(spark), updates, keys, attrs, ts)

    return table.merge_upsert(spark, None, keys=[*keys, VALID_FROM],
                              rebuild=_delta)


def scd2_current(history: DataFrame) -> DataFrame:
    """The latest-state slice (what merge_upsert alone would hold)."""
    return history.filter(F.col(VALID_TO).isNull())


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time slice: the version of every key valid AT `ts` —
    the feature-backfill join side."""
    ts_lit = ts if isinstance(ts, Column) else F.lit(ts)
    t = ts_lit.cast("timestamp")
    return history.filter(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t)))
