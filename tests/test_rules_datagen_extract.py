"""Rules compiler, datagen determinism, extraction parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.datagen import generate_transcripts, transcripts_from_events
from swarm_spark.functions.extract import with_extracted, with_grok
from swarm_spark.rules import EventRule, SchemaRule, compile_event_rules, route


class TestRules:
    def test_ops(self, spark):
        df = spark.createDataFrame(
            [("bucket-a", "logs/x.json"), ("bucket-b", "data/y.csv")],
            "bucket string, name string",
        )
        rules = [
            EventRule("r1", "bucket", "eq", "bucket-a", "s1"),
            EventRule("r2", "name", "startswith", "logs/", "s2"),
            EventRule("r3", "name", "endswith", ".csv", "s3"),
        ]
        out = route(df, rules, on_unmatched="skip")
        got = {(r.bucket, r.schema_name) for r in out.collect()}
        assert got == {("bucket-a", "s1"), ("bucket-a", "s2"), ("bucket-b", "s3")}

    def test_multi_match_fans_out(self, spark):
        df = spark.createDataFrame([("a",)], "x string")
        rules = [
            EventRule("r1", "x", "eq", "a", "s1"),
            EventRule("r2", "x", "startswith", "a", "s2"),
        ]
        assert route(df, rules, on_unmatched="skip").count() == 2

    def test_zero_match_skip_vs_keep(self, spark):
        df = spark.createDataFrame([("zzz",)], "x string")
        rules = [EventRule("r1", "x", "eq", "a", "s1")]
        assert route(df, rules, on_unmatched="skip").count() == 0
        kept = route(df, rules, on_unmatched="keep").collect()
        assert len(kept) == 1 and kept[0].schema_name is None

    def test_duplicate_schema_dedup(self, spark):
        # two rules → same schema must not double-route (set semantics)
        df = spark.createDataFrame([("a",)], "x string")
        rules = [
            EventRule("r1", "x", "eq", "a", "s1"),
            EventRule("r2", "x", "startswith", "a", "s1"),
        ]
        assert route(df, rules, on_unmatched="skip").count() == 1

    def test_invalid_op_rejected(self):
        with pytest.raises(ValueError):
            EventRule("r", "x", "matches", "a", "s").predicate()

    def test_schema_rule_validation(self):
        with pytest.raises(ValueError):
            SchemaRule("s", "t", partition_unit="week")
        with pytest.raises(ValueError):
            SchemaRule("", "t")

    def test_config_cross_validation(self, spark):
        from swarm_spark.pipeline import PipelineConfig

        with pytest.raises(ValueError):
            PipelineConfig(
                event_rules=[EventRule("r", "x", "eq", "a", "missing")],
                schema_rules=[SchemaRule("other", "t")],
                warehouse="/tmp/x",
            )

    def test_empty_ruleset_rejected(self):
        with pytest.raises(ValueError):
            compile_event_rules([])


class TestDatagen:
    def test_deterministic(self, spark):
        a = generate_transcripts(spark, 500, n_convs=20, seed=7).toPandas()
        b = generate_transcripts(spark, 500, n_convs=20, seed=7).toPandas()
        key = ["conv_id", "turn_idx"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_seed_changes_data(self, spark):
        a = generate_transcripts(spark, 500, n_convs=20, seed=7).toPandas()
        c = generate_transcripts(spark, 500, n_convs=20, seed=8).toPandas()
        assert not a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
            c.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )

    def test_skew_present(self, spark):
        df = generate_transcripts(spark, 5000, n_convs=100, seed=42)
        counts = df.groupBy("conv_id").count().toPandas()["count"]
        # Zipf-ish: hottest conversation ≫ median
        assert counts.max() > 5 * counts.median()

    def test_ts_monotone_within_conv(self, spark):
        df = generate_transcripts(spark, 1000, n_convs=10, seed=42)
        bad = (
            df.withColumn(
                "prev_ts",
                F.lag("ts").over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window
                    .partitionBy("conv_id").orderBy("turn_idx")
                ),
            )
            .filter(F.col("prev_ts") > F.col("ts"))
            .count()
        )
        assert bad == 0

    def test_turn_idx_dense(self, spark):
        df = generate_transcripts(spark, 1000, n_convs=10, seed=42)
        agg = df.groupBy("conv_id").agg(
            F.count("*").alias("n"), F.max("turn_idx").alias("mx"),
            F.min("turn_idx").alias("mn"),
        )
        bad = agg.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count()
        assert bad == 0

    def test_schema_matches_input_hint(self, spark):
        df = generate_transcripts(spark, 10, n_convs=2)
        assert df.schema.simpleString() == (
            "struct<conv_id:string,turn_idx:int,role:string,"
            "text:string,tool:string,ts:timestamp>"
        )


class TestExtractParity:
    def test_jvm_vs_grok_identical(self, spark):
        """The JVM regexp path and the Arrow grok UDF must agree."""
        df = generate_transcripts(spark, 800, n_convs=20, seed=42)
        cols = ["called_tool", "call_args", "error_code", "actor"]
        a = with_extracted(df).select("conv_id", "turn_idx", *cols).toPandas()
        b = with_grok(df).select("conv_id", "turn_idx", *cols).toPandas()
        key = ["conv_id", "turn_idx"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_extraction_values(self, spark):
        df = spark.createDataFrame(
            [("x", 'hello CALL tool=bash args={"q":1} then ERR-0042 by actor:bob',)],
            "k string, text string",
        )
        (r,) = with_extracted(df).collect()
        assert r.called_tool == "bash"
        assert r.call_args == '{"q":1}'
        assert r.error_code == "ERR-0042"
        assert r.actor == "bob"

    def test_no_match_is_null(self, spark):
        df = spark.createDataFrame([("k", "plain text")], "k string, text string")
        (r,) = with_extracted(df).collect()
        assert r.called_tool is None and r.error_code is None


class TestDerivedTranscripts:
    def test_matches_duckdb(self, spark, sf_dir):
        import duckdb

        from swarm_spark.datagen import TRANSCRIPTS_FROM_EVENTS_SQL

        got = (
            transcripts_from_events(spark, sf_dir)
            .orderBy("conv_id", "turn_idx").toPandas()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        exp = con.sql(
            TRANSCRIPTS_FROM_EVENTS_SQL + " ORDER BY conv_id, turn_idx"
        ).df()
        assert got.text.tolist() == exp.text.tolist()
        assert got.conv_id.tolist() == exp.conv_id.tolist()
        assert got.tool.where(got.tool.notna(), None).tolist() == \
            exp.tool.where(exp.tool.notna(), None).tolist()
