"""Incremental materialized aggregate maintenance over icepack tables.

The 100 TB consumer pattern: a downstream aggregate (e.g. the
(sink, role, tool, hour) counters swarm emits per ingest,
/root/reference/pkg/usecase/ingest.go counters + BigQuery scheduled
rollups) must NOT rescan the whole fact table per refresh. Instead:

* the fact table is an icepack table whose appends are consumed via
  `read_incremental(after_sid, to_sid)` — only the NEW `_s=` dirs are
  scanned (bytes read per refresh ∝ new data, not table size);
* the refresh computes a PARTIAL aggregate of just the increment (one
  map-side-combined shuffle over the increment) and APPENDS the delta
  rows to the aggregate table — additive aggregates (count/sum) merge
  by re-aggregation at read time, so the agg table itself is never
  rewritten per batch;
* the source snapshot id the delta covers rides the SAME atomic commit
  (snapshot `extra_meta`), so the checkpoint and the data can never
  disagree — a crashed refresh re-runs from the last COMMITTED
  checkpoint and is exactly-once by construction;
* periodically (or when delta rows accumulate), `compact_agg` rewrites
  the agg table to one row per key — a `compact`-style snapshot that
  preserves the checkpoint;
* a rewrite in the fact table's history (overwrite / merge / compact
  crossing the checkpoint) makes the append-diff invalid —
  IncrementalReadError — and the refresh falls back to a full
  recompute, recorded as an `overwrite` with the new checkpoint.

Read `read_agg` for the merge-at-read contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tablestore import CommitConflict, IcepackTable, IncrementalReadError

_CKPT_KEY = "src_snapshot_id"


def _partial_agg(df: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """Partial aggregate: count(*) AS n plus sum(expr) AS name for each
    entry in `sums` ({out_name: input_column}). All additive, so delta
    rows merge by re-aggregation."""
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(F.col(src)).alias(out) for out, src in sums.items()]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def _partial_agg_signed(ch: DataFrame, keys: list[str],
                        sums: dict[str, str]) -> DataFrame:
    """Signed partial aggregate over a CDC changelog: insert rows
    contribute +1/+value, delete rows −1/−value (RETRACTIONS). The
    delta appends like any other; read_agg's merge nets them out —
    additive aggregates stay exact through merge-on-read deletes
    without rescanning the fact table."""
    sign = F.when(F.col("_change_type") == "delete", F.lit(-1)) \
        .otherwise(F.lit(1))
    aggs = [F.sum(sign).alias("n")]
    aggs += [F.sum(sign * F.col(src)).alias(out) for out, src in sums.items()]
    return ch.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def refresh_agg(
    spark: SparkSession,
    src: IcepackTable,
    dst: IcepackTable,
    keys: list[str],
    sums: dict[str, str] | None = None,
    prepare=None,
) -> dict:
    """Bring the aggregate table `dst` up to date with `src`'s CURRENT
    snapshot. Returns {"mode": "noop"|"incremental"|"full",
    "src_snapshot_id": int, "delta_rows": int}.

    `prepare(df) -> df` optionally maps the (incremental or full) fact
    rows before aggregation (e.g. derive the hour bucket column).
    Idempotent: a second call with no new source commits is a no-op.

    Safe under CONCURRENT refreshers: the delta append is conditional
    on dst's checkpoint still being the one this refresh read
    (tablestore `require_parent_meta`), so two overlapping refreshes
    that both read checkpoint X cannot both land the same delta — the
    loser gets CommitConflict, re-reads the (now-advanced) checkpoint
    and retries with the correct, smaller increment. Exactly-once
    holds without a single-refresher assumption.
    """
    sums = sums or {}
    for _ in range(10):
        cur = src.current_snapshot()
        if cur is None:
            raise FileNotFoundError(f"source table {src.name} has no snapshots")
        src_sid = cur["snapshot_id"]
        last = None
        if dst.exists():
            last = dst.current_snapshot().get(_CKPT_KEY)
        if last == src_sid:
            return {"mode": "noop", "src_snapshot_id": src_sid, "delta_rows": 0}

        if last is not None:
            try:
                inc = src.read_incremental(spark, last, src_sid)
                if prepare is not None:
                    inc = prepare(inc)
                delta = _partial_agg(inc, keys, sums)
                snap = dst.append(delta, extra_meta={_CKPT_KEY: src_sid},
                                  require_parent_meta={_CKPT_KEY: last})
                return {"mode": "incremental", "src_snapshot_id": src_sid,
                        "delta_rows": snap["added_rows"]}
            except IncrementalReadError:
                # appends + merge-on-read deletes in the range: maintain
                # through the CDC changelog — deletes become RETRACTION
                # rows (negative partials), so the erasure queue does
                # not force a fact-table rescan. prepare() must keep
                # the _change_type column (it only ever needs to ADD
                # derived columns). A cow rewrite still raises here and
                # falls through to the full recompute.
                try:
                    ch = src.read_changelog(spark, last, src_sid)
                    if prepare is not None:
                        ch = prepare(ch)
                    delta = _partial_agg_signed(ch, keys, sums)
                    snap = dst.append(delta, extra_meta={_CKPT_KEY: src_sid},
                                      require_parent_meta={_CKPT_KEY: last})
                    return {"mode": "incremental_cdc",
                            "src_snapshot_id": src_sid,
                            "delta_rows": snap["added_rows"]}
                except IncrementalReadError:
                    pass  # rewrite crossed the checkpoint → full recompute
                except CommitConflict:
                    continue
            except CommitConflict:
                continue  # another refresher advanced the checkpoint — re-read

        full = src.read(spark, snapshot_id=src_sid)
        if prepare is not None:
            full = prepare(full)
        agg = _partial_agg(full, keys, sums)
        try:
            # Conditional on the checkpoint we read: a concurrent refresher
            # that already advanced it (possibly past src_sid) must not be
            # clobbered by our stale full recompute.
            snap = dst.overwrite(agg, op="overwrite",
                                 extra_meta={_CKPT_KEY: src_sid},
                                 require_parent_meta={_CKPT_KEY: last})
        except CommitConflict:
            continue  # concurrent commit during the rewrite — re-read and retry
        return {"mode": "full", "src_snapshot_id": src_sid,
                "delta_rows": snap["added_rows"]}
    raise CommitConflict(
        f"refresh_agg({dst.name}): persistent checkpoint contention after 10 attempts"
    )


def read_agg(spark: SparkSession, dst: IcepackTable, keys: list[str],
             sums: dict[str, str] | None = None) -> DataFrame:
    """Merged view of the aggregate table: delta rows from successive
    refreshes re-aggregate by key (sum of counts / sums). The scan is
    over agg-sized data (≪ fact table); the re-aggregation is the same
    map-side-combined shuffle shape as any final-merge of partial
    aggregates."""
    sums = sums or {}
    df = dst.read(spark)
    aggs = [F.sum("n").alias("n")]
    aggs += [F.sum(F.col(out)).alias(out) for out in sums.keys()]
    merged = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    # retraction deltas (incremental_cdc) can net a key to zero — a
    # fully-erased key must disappear, matching a full recompute
    return merged.filter(F.col("n") != 0)


def compact_agg(spark: SparkSession, dst: IcepackTable, keys: list[str],
                sums: dict[str, str] | None = None) -> dict:
    """Rewrite the aggregate table to one row per key, preserving the
    checkpoint. Bounds agg-table growth when many small refreshes
    accumulate; time travel to pre-compaction snapshots still works
    until expire_snapshots."""
    ckpt = dst.current_snapshot().get(_CKPT_KEY)
    merged = read_agg(spark, dst, keys, sums)
    return dst.overwrite(merged, op="compact",
                         extra_meta={_CKPT_KEY: ckpt})
