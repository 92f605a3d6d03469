"""Warehouse maintenance CLI (swarm_spark/maintain.py): count-triggered
compaction, snapshot expiry + vacuum, rollup refresh."""

from __future__ import annotations

import os

from swarm_spark.maintain import live_file_count, maintain
from swarm_spark.tablestore import IcepackCatalog


def _fragmented_table(spark, root, name="t", appends=6):
    cat = IcepackCatalog(root)
    t = cat.table(name)
    for i in range(appends):
        t.append(spark.createDataFrame([(i, f"v{i}")], "a bigint, b string"))
    return t


class TestMaintain:
    def test_compaction_triggered_by_file_count(self, spark, tmp_path):
        t = _fragmented_table(spark, str(tmp_path))
        before = live_file_count(t)
        assert before >= 6
        rep = maintain(spark, str(tmp_path), compact_above_files=3,
                       target_files=1)
        e = rep["tables"]["t"]
        assert e["compacted"] and e["files_after"] < before
        # data intact after the rewrite
        assert sorted(r["a"] for r in t.read(spark).collect()) == list(range(6))

    def test_below_threshold_untouched(self, spark, tmp_path):
        t = _fragmented_table(spark, str(tmp_path), appends=2)
        sid = t.current_snapshot()["snapshot_id"]
        rep = maintain(spark, str(tmp_path), compact_above_files=10)
        assert "compacted" not in rep["tables"]["t"]
        assert t.current_snapshot()["snapshot_id"] == sid

    def test_expiry_vacuums_old_dirs(self, spark, tmp_path):
        t = _fragmented_table(spark, str(tmp_path))
        maintain(spark, str(tmp_path), compact_above_files=1, target_files=1)
        rep = maintain(spark, str(tmp_path), expire_keep=1)
        assert rep["tables"]["t"]["expired"]["expired"] >= 1
        # only CURRENT's dirs remain on disk
        snap = t.current_snapshot()
        live = {os.path.basename(d) for d in snap["data_dirs"]}
        on_disk = {d for d in os.listdir(t.data) if d.startswith("_s=")}
        assert on_disk == live
        assert t.read(spark).count() == 6

    def test_rollup_refresh_via_maintain(self, spark, tmp_path):
        from pyspark.sql import functions as F

        cat = IcepackCatalog(str(tmp_path))
        hourly = cat.table("_agg_hourly")
        hourly.append(spark.createDataFrame(
            [("s1", "user", "t1", "2024-01-01 10:00:00", 4)],
            "sink string, role string, tool string, hour_s string, n bigint")
            .select("sink", "role", "tool",
                    F.col("hour_s").cast("timestamp").alias("hour"), "n"))
        rep = maintain(spark, str(tmp_path), refresh_daily_rollup=True)
        assert rep["daily_rollup"]["mode"] == "full"
        daily = cat.table("_agg_daily")
        rows = daily.read(spark).collect()
        assert len(rows) == 1 and rows[0]["turns"] == 4

    def test_cluster_by_compaction_enables_file_skipping(self, spark, tmp_path):
        """--cluster-by flows through maintain to compact(); tables
        missing the column are compacted unclustered, not failed."""
        from pyspark.sql import functions as F

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("t")
        for start in range(3):  # interleaved appends: bounds useless
            t.append(spark.range(start, 300, 3).select(
                F.col("id").alias("k"), F.lit("x").alias("v")).repartition(2))
        other = cat.table("other")  # no 'k' column
        other.append(spark.createDataFrame([("a",), ("b",)], "name string"))
        other.append(spark.createDataFrame([("c",)], "name string"))
        rep = maintain(spark, str(tmp_path), compact_above_files=1,
                       target_files=3, cluster_by=["k"])
        assert rep["tables"]["t"]["compacted"]
        assert rep["tables"]["other"]["compacted"]
        point = t.prune_report([("k", "=", 123)])
        assert point["files_kept"] == 1 and point["files_total"] >= 3
        assert t.read(spark, prune=[("k", "=", 123)]).count() == 1
        assert other.read(spark).count() == 3


class TestEraseBatch:
    def test_erase_rewrites_only_the_batch_dirs(self, spark, tmp_path):
        """Three batch appends; erasing the middle one must rewrite
        ZERO dirs beyond metadata: every surviving batch's dir is
        carried verbatim (the per-append sidecar pins ingest_id
        min=max, so pruning excludes the other batches outright)."""
        from pyspark.sql import functions as F

        from swarm_spark.maintain import erase_batch

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("sink_user")
        for b in ("b1", "b2", "b3"):
            t.append(spark.range(0, 10).select(
                F.col("id").alias("k"), F.lit(b).alias("ingest_id")))
        agg = cat.table("_agg")  # no ingest_id → skipped
        agg.append(spark.createDataFrame([(1,)], "n int"))
        dirs_before = set(t.current_snapshot()["data_dirs"])

        rep = erase_batch(spark, str(tmp_path), "b2")
        assert rep["sink_user"] == {
            "rows_deleted": 10, "dirs_rewritten": 1, "dirs_untouched": 2}
        assert rep["_agg"] == {"skipped": "no ingest_id column"}
        # the two surviving batches' dirs are literally the same dirs
        assert len(dirs_before & set(t.current_snapshot()["data_dirs"])) == 2
        got = t.read(spark)
        assert got.count() == 20
        assert got.filter(F.col("ingest_id") == "b2").count() == 0

    def test_erase_via_maintain_cli_path(self, spark, tmp_path):
        from pyspark.sql import functions as F

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("s")
        for b in ("x", "y"):
            t.append(spark.range(0, 5).select(
                F.col("id").alias("k"), F.lit(b).alias("ingest_id")))
        rep = maintain(spark, str(tmp_path), erase_batch_id="x")
        assert rep["erased"]["s"]["rows_deleted"] == 5
        assert t.read(spark).count() == 5

    def test_erase_mor_then_fold(self, spark, tmp_path):
        """--erase-mode mor records the batch excision as a
        merge-on-read mask (zero dirs rewritten), reads hide it
        immediately, and --fold-deletes-above compacts it into data."""
        from pyspark.sql import functions as F

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("sink_user")
        for b in ("b1", "b2", "b3"):
            t.append(spark.range(0, 10).select(
                F.col("id").alias("k"), F.lit(b).alias("ingest_id")))
        dirs_before = list(t.current_snapshot()["data_dirs"])

        rep = maintain(spark, str(tmp_path), erase_batch_id="b2",
                       erase_mode="mor")
        assert rep["erased"]["sink_user"] == {"mode": "mor",
                                              "dirs_affected": 1}
        t = cat.table("sink_user")
        assert t.current_snapshot()["data_dirs"] == dirs_before  # no rewrite
        got = t.read(spark)
        assert got.count() == 20
        assert got.filter(F.col("ingest_id") == "b2").count() == 0

        rep = maintain(spark, str(tmp_path), fold_deletes_above=0)
        assert rep["tables"]["sink_user"]["deletes_folded"] == 1
        snap = cat.table("sink_user").current_snapshot()
        assert snap.get("deletes") == []
        assert cat.table("sink_user").read(spark).count() == 20

    def test_tag_via_maintain(self, spark, tmp_path):
        from pyspark.sql import functions as F

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("s")
        t.append(spark.range(2).select(F.col("id").alias("k")))
        rep = maintain(spark, str(tmp_path), create_tag="release-1")
        assert rep["tables"]["s"]["tagged"] == {"release-1": 1}
        t.append(spark.range(5).select(F.col("id").alias("k")))
        t.expire_snapshots(keep_last=1)
        assert cat.table("s").read(spark, tag="release-1").count() == 2
