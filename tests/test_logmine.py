"""Log template mining + integer-exact spike detection
(operators/logmine)."""

from __future__ import annotations

from swarm_spark.operators.logmine import hourly_spikes, log_skeleton, log_templates


class TestLogTemplates:
    def test_digit_tokens_become_slots(self, spark):
        df = spark.createDataFrame(
            [("evt 58 actor:u7 type=click",),
             ("evt 99 actor:u3 type=click",),
             ("plain words only",),
             ("deadbeef12 0xFF args={\"q\":184}",)],
            "text string")
        got = {r["text"]: r["sk"]
               for r in df.select("text", log_skeleton("text").alias("sk")).collect()}
        assert got["evt 58 actor:u7 type=click"] == "evt <*> <*> type=click"
        assert got["plain words only"] == "plain words only"
        assert got["deadbeef12 0xFF args={\"q\":184}"] == "<*> <*> <*>"

    def test_template_counts_and_example(self, spark):
        df = spark.createDataFrame(
            [("evt 58 type=click",), ("evt 99 type=click",),
             ("evt 11 type=view",)],
            "text string")
        rows = {r["template"]: (r["n_lines"], r["example"])
                for r in log_templates(df).collect()}
        assert rows["evt <*> type=click"] == (2, "evt 58 type=click")
        assert rows["evt <*> type=view"] == (1, "evt 11 type=view")


class TestHourlySpikes:
    def _df(self, spark):
        # toolA: flat 10/hour for 6 hours then a 40 burst;
        # toolB: too little history for a flag
        rows = []
        for h in range(6):
            rows += [("toolA", f"2024-01-01 0{h}:15:00")] * 10
        rows += [("toolA", "2024-01-01 06:15:00")] * 40
        rows += [("toolB", "2024-01-01 00:05:00")] * 3
        rows += [("toolB", "2024-01-01 01:05:00")] * 99
        import pyspark.sql.functions as F

        return spark.createDataFrame(rows, "tool string, ts_s string") \
            .select("tool", F.col("ts_s").cast("timestamp").alias("ts"))

    def test_burst_flagged_history_gated(self, spark):
        out = hourly_spikes(self._df(spark), key_col="tool", ts_col="ts",
                            window_hours=6, factor=2, min_history=3)
        got = {(r["key"], str(r["hour"])): (r["n"], r["trail_sum"],
                                            r["trail_cnt"], r["is_spike"])
               for r in out.collect()}
        # burst hour: trailing 6 hours sum 60, cnt 6; 40*6 > 2*60
        assert got[("toolA", "2024-01-01 06:00:00")] == (40, 60, 6, True)
        # flat hours never spike (10*cnt <= 2*10*cnt)
        assert got[("toolA", "2024-01-01 03:00:00")] == (10, 30, 3, False)
        # first hour has no history
        assert got[("toolA", "2024-01-01 00:00:00")] == (10, 0, 0, False)
        # toolB burst is 33x but has only 1 trailing hour < min_history
        assert got[("toolB", "2024-01-01 01:00:00")] == (99, 3, 1, False)

    def test_null_keys_dropped(self, spark):
        import pyspark.sql.functions as F

        df = self._df(spark).withColumn(
            "tool", F.when(F.col("tool") == "toolB", None).otherwise(F.col("tool")))
        keys = {r["key"] for r in hourly_spikes(df).select("key").distinct().collect()}
        assert keys == {"toolA"}


class TestTfidfTopk:
    def test_ranking_and_tiebreak(self, spark):
        from swarm_spark.operators.textstats import doc_tfidf_topk

        df = spark.createDataFrame(
            [(1, "apple apple banana common"),
             (2, "banana cherry common"),
             (3, "common common dog")],
            "doc_id bigint, text string")
        out = {(r["doc_id"], r["rank"]): (r["token"], r["tf"], r["doc_freq"])
               for r in doc_tfidf_topk(df, k=2).collect()}
        # doc 1: apple tf=2 df=1 (score 2.0) > banana tf=1 df=2 (0.5)
        assert out[(1, 1)] == ("apple", 2, 1)
        assert out[(1, 2)] == ("banana", 1, 2)
        # doc 2: banana (1/2) and cherry (1/1): cherry wins on score
        assert out[(2, 1)] == ("cherry", 1, 1)
        assert out[(2, 2)] == ("banana", 1, 2)
        # doc 3: common tf=2 df=3 (0.667) vs dog 1/1 (1.0) -> dog first
        assert out[(3, 1)] == ("dog", 1, 1)
        assert out[(3, 2)] == ("common", 2, 3)

    def test_equal_scores_tie_on_token(self, spark):
        from swarm_spark.operators.textstats import doc_tfidf_topk

        df = spark.createDataFrame([(1, "zeta alpha")], "doc_id bigint, text string")
        rows = doc_tfidf_topk(df, k=2).orderBy("rank").collect()
        assert [r["token"] for r in rows] == ["alpha", "zeta"]
