"""SemDeDup (operators/dedup.semantic_dedup_keep): cluster-bounded
semantic near-dup removal with the integer-exact score."""

import pyspark.sql.functions as F
import pytest

from swarm_spark.operators.dedup import semantic_dedup_keep


def _corpus(spark, n=40, dim=8):
    """n distinct-ish vectors + exact copies of the first 3."""
    rows = [(i, [((i * 7 + j * 13) % 101) / 101.0 + 0.01 for j in range(dim)])
            for i in range(n)]
    rows += [(1000 + i, rows[i][1]) for i in range(3)]  # exact copies
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestSemanticDedup:
    def test_exact_copies_dropped_keep_lowest_id(self, spark, tmp_path):
        df = _corpus(spark)
        kept = semantic_dedup_keep(df, k=4, iterations=1, threshold=0.999)
        ids = {r.vec_id for r in kept.collect()}
        assert {1000, 1001, 1002}.isdisjoint(ids)  # copies dropped
        assert {0, 1, 2} <= ids                    # originals kept

    def test_threshold_one_only_identical(self, spark):
        df = _corpus(spark)
        kept = semantic_dedup_keep(df, k=4, iterations=1, threshold=1.0)
        # score_q of an exact copy is exactly 1_000_000 = int(1e6·1·1)
        ids = {r.vec_id for r in kept.collect()}
        assert {1000, 1001, 1002}.isdisjoint(ids)
        assert len(ids) == 40

    def test_threshold_zero_keeps_one_per_similar_set(self, spark):
        df = _corpus(spark, n=10)
        kept = semantic_dedup_keep(df, k=2, iterations=1, threshold=0.0)
        # every positive-cos pair collapses: survivors are cluster
        # minima (plus any vector orthogonal-or-negative to all
        # lower-id members) — at minimum one per cluster survives
        assert 1 <= kept.count() <= 10

    def test_hot_cluster_guard(self, spark):
        df = _corpus(spark, n=30)
        with pytest.raises(ValueError, match="max_cluster"):
            semantic_dedup_keep(df, k=2, iterations=0, max_cluster=5)

    def test_bad_threshold_rejected(self, spark):
        df = _corpus(spark, n=10)
        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup_keep(df, k=2, threshold=1.5)

    def test_output_schema(self, spark):
        df = _corpus(spark, n=12)
        kept = semantic_dedup_keep(df, k=3, iterations=1, threshold=0.999)
        assert set(kept.columns) == {"vec_id", "cluster"}
