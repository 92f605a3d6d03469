"""Incremental append scan (read_incremental / changes_between) and
incremental materialized-aggregate maintenance (swarm_spark.incremental).

The 100 TB contract under test: a downstream consumer that checkpoints
the last source snapshot id reads ONLY the newly-appended data dirs per
refresh, the checkpoint rides the same atomic commit as the delta rows
(exactly-once), and any rewrite in the source history makes the diff
invalid loudly (IncrementalReadError) rather than silently wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.incremental import compact_agg, read_agg, refresh_agg
from swarm_spark.tablestore import IcepackCatalog, IncrementalReadError


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestReadIncremental:
    def test_appends_diff_exactly(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        s1 = t.append(spark.createDataFrame([(1,), (2,)], "a bigint"))
        s2 = t.append(spark.createDataFrame([(3,)], "a bigint"))
        s3 = t.append(spark.createDataFrame([(4,), (5,)], "a bigint"))
        inc = t.read_incremental(spark, s1["snapshot_id"], s3["snapshot_id"])
        assert _rows(inc, "a") == [(3,), (4,), (5,)]
        # default `to` is CURRENT
        inc2 = t.read_incremental(spark, s2["snapshot_id"])
        assert _rows(inc2, "a") == [(4,), (5,)]

    def test_empty_range_and_since_creation(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        s1 = t.append(spark.createDataFrame([(1,)], "a bigint"))
        assert t.read_incremental(spark, s1["snapshot_id"]).count() == 0
        # after=None → everything since creation
        assert _rows(t.read_incremental(spark, None), "a") == [(1,)]

    def test_schema_evolution_nulls_old_dirs(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        s0 = t.append(spark.createDataFrame([(0, "z")], "a bigint, b string"))
        t.append(spark.createDataFrame([(1, "x")], "a bigint, b string"))
        t.append(spark.createDataFrame([(2, "y", 9.0)], "a bigint, b string, c double"))
        inc = t.read_incremental(spark, s0["snapshot_id"])
        # projected to the `to` schema: pre-evolution increment rows
        # carry null c
        assert [f.name for f in inc.schema.fields] == ["a", "b", "c"]
        got = {r["a"]: r["c"] for r in inc.collect()}
        assert got == {1: None, 2: 9.0}

    def test_rewrite_in_range_raises(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        for rewrite in ("overwrite", "compact"):
            t = cat.table(f"t_{rewrite}")
            s1 = t.append(spark.createDataFrame([(1,)], "a bigint"))
            if rewrite == "overwrite":
                t.overwrite(spark.createDataFrame([(9,)], "a bigint"))
            else:
                t.compact(spark)
            t.append(spark.createDataFrame([(2,)], "a bigint"))
            with pytest.raises(IncrementalReadError):
                t.read_incremental(spark, s1["snapshot_id"])

    def test_non_ancestor_raises(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        s1 = t.append(spark.createDataFrame([(1,)], "a bigint"))
        t.append(spark.createDataFrame([(2,)], "a bigint"))
        with pytest.raises(IncrementalReadError):
            t.changes_between(s1["snapshot_id"] + 999)

    def test_changes_between_oldest_first(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        s1 = t.append(spark.createDataFrame([(1,)], "a bigint"))
        s2 = t.append(spark.createDataFrame([(2,)], "a bigint"))
        s3 = t.append(spark.createDataFrame([(3,)], "a bigint"))
        chain = t.changes_between(s1["snapshot_id"])
        assert [s["snapshot_id"] for s in chain] == [s2["snapshot_id"], s3["snapshot_id"]]


class TestIncrementalAgg:
    KEYS = ["k"]

    def _src(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        return cat.table("facts"), cat.table("agg")

    def test_refresh_matches_full_recompute(self, spark, tmp_path):
        src, dst = self._src(spark, tmp_path)
        src.append(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v bigint"))
        r1 = refresh_agg(spark, src, dst, self.KEYS, sums={"sv": "v"})
        assert r1["mode"] == "full"
        src.append(spark.createDataFrame([("a", 10), ("c", 5)], "k string, v bigint"))
        r2 = refresh_agg(spark, src, dst, self.KEYS, sums={"sv": "v"})
        assert r2["mode"] == "incremental"
        got = _rows(read_agg(spark, dst, self.KEYS, sums={"sv": "v"}), "k", "n", "sv")
        want = _rows(
            src.read(spark).groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")),
            "k", "n", "sv")
        assert got == want == [("a", 2, 11), ("b", 1, 2), ("c", 1, 5)]

    def test_refresh_idempotent_noop(self, spark, tmp_path):
        src, dst = self._src(spark, tmp_path)
        src.append(spark.createDataFrame([("a", 1)], "k string, v bigint"))
        refresh_agg(spark, src, dst, self.KEYS)
        r = refresh_agg(spark, src, dst, self.KEYS)
        assert r["mode"] == "noop"
        assert _rows(read_agg(spark, dst, self.KEYS), "k", "n") == [("a", 1)]

    def test_source_rewrite_falls_back_to_full(self, spark, tmp_path):
        src, dst = self._src(spark, tmp_path)
        src.append(spark.createDataFrame([("a", 1), ("a", 2)], "k string, v bigint"))
        refresh_agg(spark, src, dst, self.KEYS)
        src.compact(spark)  # rewrite crosses the checkpoint
        src.append(spark.createDataFrame([("b", 3)], "k string, v bigint"))
        r = refresh_agg(spark, src, dst, self.KEYS)
        assert r["mode"] == "full"
        assert _rows(read_agg(spark, dst, self.KEYS), "k", "n") == [("a", 2), ("b", 1)]

    def test_compact_agg_preserves_checkpoint_and_values(self, spark, tmp_path):
        src, dst = self._src(spark, tmp_path)
        for batch in ([("a", 1)], [("a", 2)], [("b", 3)]):
            src.append(spark.createDataFrame(batch, "k string, v bigint"))
            refresh_agg(spark, src, dst, self.KEYS, sums={"sv": "v"})
        before = _rows(read_agg(spark, dst, self.KEYS, sums={"sv": "v"}), "k", "n", "sv")
        assert dst.current_snapshot()["row_count"] >= 3  # delta rows accumulated
        compact_agg(spark, dst, self.KEYS, sums={"sv": "v"})
        after = _rows(read_agg(spark, dst, self.KEYS, sums={"sv": "v"}), "k", "n", "sv")
        assert after == before == [("a", 2, 3), ("b", 1, 3)]
        # checkpoint survived the rewrite → next refresh is a noop
        assert refresh_agg(spark, src, dst, self.KEYS, sums={"sv": "v"})["mode"] == "noop"

    def test_prepare_hour_bucket(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("ev"), cat.table("ev_hourly")
        src.append(spark.createDataFrame(
            [("s1", "2024-01-01 10:05:00"), ("s1", "2024-01-01 10:55:00"),
             ("s2", "2024-01-01 11:00:00")],
            "sink string, ts string"))

        def prep(df):
            return df.withColumn("hour", F.date_trunc("hour", F.col("ts").cast("timestamp")))

        refresh_agg(spark, src, dst, ["sink", "hour"], prepare=prep)
        src.append(spark.createDataFrame([("s1", "2024-01-01 10:59:00")], "sink string, ts string"))
        refresh_agg(spark, src, dst, ["sink", "hour"], prepare=prep)
        got = {(r["sink"], str(r["hour"])): r["n"]
               for r in read_agg(spark, dst, ["sink", "hour"]).collect()}
        assert got == {("s1", "2024-01-01 10:00:00"): 3,
                       ("s2", "2024-01-01 11:00:00"): 1}


class TestJobDailyRollup:
    def test_cli_refresh_incremental_and_correct(self, spark, tmp_path):
        """job.py --refresh-daily-rollup: first batch full-computes
        _agg_daily, second batch refreshes it INCREMENTALLY, and the
        merged rollup equals a full recompute over _agg_hourly."""
        from pyspark.sql import functions as F

        from swarm_spark import job
        from swarm_spark.incremental import read_agg
        from swarm_spark.tablestore import IcepackCatalog

        wh = str(tmp_path / "wh")
        base = ["--input", "/root/testdata/sf0.001", "--derive-from-events",
                "--warehouse", wh, "--refresh-daily-rollup", "--cpus", "8"]
        assert job.main(base + ["--batch-id", "b1"]) == 0
        assert job.main(base + ["--batch-id", "b2"]) == 0

        cat = IcepackCatalog(wh)
        hourly, daily = cat.table("_agg_hourly"), cat.table("_agg_daily")
        # checkpoint tracked the source head
        assert daily.current_snapshot()["src_snapshot_id"] == \
            hourly.current_snapshot()["snapshot_id"]
        # second refresh appended a delta (op=append), not a rewrite
        assert daily.current_snapshot()["op"] == "append"

        keys = ["sink", "role", "tool", "day"]
        got = read_agg(spark, daily, keys, sums={"turns": "n"}) \
            .select(*keys, "turns")
        want = (hourly.read(spark)
                .withColumn("day", F.date_trunc("day", "hour"))
                .groupBy(*keys).agg(F.sum("n").alias("turns")))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


class TestExpiryInterplay:
    def test_expired_checkpoint_forces_full_refresh(self, spark, tmp_path):
        """If snapshot GC removes the snapshot a consumer checkpointed,
        changes_between raises (loudly — never a silent wrong diff) and
        refresh_agg falls back to a full recompute."""
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame([("a", 1)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"])
        src.append(spark.createDataFrame([("b", 2)], "k string, v bigint"))
        src.append(spark.createDataFrame([("c", 3)], "k string, v bigint"))
        src.expire_snapshots(keep_last=1)  # checkpointed snapshot GONE
        with pytest.raises(IncrementalReadError):
            src.changes_between(1)
        r = refresh_agg(spark, src, dst, ["k"])
        assert r["mode"] == "full"
        assert _rows(read_agg(spark, dst, ["k"]), "k", "n") == \
            [("a", 1), ("b", 1), ("c", 1)]


class TestStreamingFeedsRollup:
    def test_stream_epochs_then_incremental_rollup(self, spark, tmp_path):
        """Streaming epochs append snapshots to the sink tables; a
        downstream rollup consumer then refreshes incrementally from
        those appends and matches a full recompute."""
        from swarm_spark.datagen import generate_transcripts
        from swarm_spark.pipeline import IngestPipeline, PipelineConfig
        from swarm_spark.presets import (
            default_event_rules,
            default_schema_rules,
            default_tool_dim,
        )
        from swarm_spark.streaming.ingest import (
            start_ingest_stream,
            stream_transcripts,
        )

        src = str(tmp_path / "src")
        generate_transcripts(spark, 800, n_convs=16, seed=7) \
            .repartition(6).write.parquet(src)  # 6 files → 3 light epochs
        cfg = PipelineConfig(
            event_rules=default_event_rules(),
            schema_rules=default_schema_rules(),
            warehouse=str(tmp_path / "wh"),
            tool_dim=default_tool_dim(spark),
        )
        pipe = IngestPipeline(spark, cfg)
        q = start_ingest_stream(
            stream_transcripts(spark, src, max_files_per_trigger=2),
            pipe, str(tmp_path / "ckpt"), epoch_mode="light")
        q.awaitTermination(120)

        sink = pipe.catalog.table("sink_tools")
        assert len(sink.snapshots()) >= 2  # multiple epochs landed

        rollup = pipe.catalog.table("sink_tools_hourly")
        keys = ["role", "tool", "hour"]
        prep = lambda df: df.withColumn(  # noqa: E731
            "hour", F.date_trunc("hour", F.col("timestamp")))
        r1 = refresh_agg(spark, sink, rollup, keys, prepare=prep)
        assert r1["mode"] == "full"

        # a second stream over NEW files appends more snapshots
        generate_transcripts(spark, 400, n_convs=8, seed=8) \
            .repartition(4).write.mode("append").parquet(src)
        q2 = start_ingest_stream(
            stream_transcripts(spark, src, max_files_per_trigger=2),
            pipe, str(tmp_path / "ckpt"), epoch_mode="light")
        q2.awaitTermination(120)

        r2 = refresh_agg(spark, sink, rollup, keys, prepare=prep)
        assert r2["mode"] == "incremental"
        got = _rows(read_agg(spark, rollup, keys), *keys, "n")
        want = _rows(
            prep(sink.read(spark)).groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n")),
            *keys, "n")
        assert got == want and len(got) > 0


class TestRefreshThroughMorDeletes:
    def test_cdc_refresh_equals_full_recompute(self, spark, tmp_path):
        """A merge-on-read erase between refreshes maintains the
        rollup via changelog RETRACTIONS (mode=incremental_cdc) — no
        fact-table rescan — and the merged aggregate equals a full
        recompute of the current table."""
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"], sums={"total": "v"})
        # erasure queue: mor delete one of a's rows + a new append
        src.delete_where(spark, [("v", "=", 2)], mode="mor")
        src.append(spark.createDataFrame([("b", 10)], "k string, v bigint"))
        r = refresh_agg(spark, src, dst, ["k"], sums={"total": "v"})
        assert r["mode"] == "incremental_cdc"
        got = _rows(read_agg(spark, dst, ["k"], sums={"total": "v"}),
                    "k", "n", "total")
        assert got == [("a", 1, 1), ("b", 2, 13)]

    def test_fully_erased_key_disappears(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"])
        src.delete_keys(spark, spark.createDataFrame([("a",)], "k string"),
                        ["k"])
        r = refresh_agg(spark, src, dst, ["k"])
        assert r["mode"] == "incremental_cdc"
        assert _rows(read_agg(spark, dst, ["k"]), "k", "n") == [("b", 1)]

    def test_cow_rewrite_still_forces_full(self, spark, tmp_path):
        cat = IcepackCatalog(str(tmp_path))
        src, dst = cat.table("f"), cat.table("a")
        src.append(spark.createDataFrame([("a", 1)], "k string, v bigint"))
        refresh_agg(spark, src, dst, ["k"])
        src.delete_where(spark, [("v", "=", 1)])  # cow — not attributable
        src.append(spark.createDataFrame([("c", 5)], "k string, v bigint"))
        r = refresh_agg(spark, src, dst, ["k"])
        assert r["mode"] == "full"
        assert _rows(read_agg(spark, dst, ["k"]), "k", "n") == [("c", 1)]
