"""Product quantization (similarity.pq_train/pq_encode/pq_topk):
compression-side ANN with integer-exact determinism."""

import pyspark.sql.functions as F
import pytest

from swarm_spark.operators.similarity import (
    cosine_topk, pq_encode, pq_topk, pq_train)


def _vectors(spark, n=300, dim=16):
    rows = [(i, [((i * 7 + j * 13) % 101) / 101.0 - 0.5 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestPQ:
    def test_self_retrieval(self, spark):
        df = _vectors(spark)
        books = pq_train(df, dim=16, m=4, k=8, iterations=1)
        codes = pq_encode(df, books)
        q = list(df.filter(F.col("vec_id") == 42).first()["embedding"])
        top = pq_topk(codes, books, q, k=5).collect()
        # PQ can't guarantee rank-1 self-retrieval (another vector may
        # share the query's codes and win the id tiebreak), but the
        # query's own codes are at ADC-minimum — it must be in top-5
        assert 42 in {r.vec_id for r in top}

    def test_codebook_shape_and_determinism(self, spark):
        df = _vectors(spark, n=100)
        b1 = pq_train(df, dim=16, m=4, k=8, iterations=1)
        b2 = pq_train(df.repartition(7), dim=16, m=4, k=8, iterations=1)
        assert len(b1) == 4 and len(b1[0]) == 8 and len(b1[0][0]) == 4
        assert b1 == b2  # partitioning-independent

    def test_recall_against_exact_topk(self, spark):
        """PQ is approximate; on this corpus ADC top-10 must recover
        most of the exact cosine top-10 (recall pinned, not hoped)."""
        df = _vectors(spark, n=400, dim=16)
        books = pq_train(df, dim=16, m=8, k=16, iterations=1)
        codes = pq_encode(df, books)
        q = list(df.filter(F.col("vec_id") == 7).first()["embedding"])
        got = {r.vec_id for r in pq_topk(codes, books, q, k=10).collect()}
        exact = {r.vec_id for r in
                 cosine_topk(df, q, k=10).collect()}
        assert len(got & exact) >= 5

    def test_dim_not_divisible_rejected(self, spark):
        df = _vectors(spark, n=20)
        with pytest.raises(ValueError, match="divisible"):
            pq_train(df, dim=16, m=5)

    def test_query_dim_mismatch_rejected(self, spark):
        df = _vectors(spark, n=20)
        books = pq_train(df, dim=16, m=4, k=4, iterations=0)
        codes = pq_encode(df, books)
        with pytest.raises(ValueError, match="dim"):
            pq_topk(codes, books, [0.0] * 7)

    def test_codes_are_small_ints(self, spark):
        df = _vectors(spark, n=50)
        books = pq_train(df, dim=16, m=4, k=8, iterations=1)
        codes = pq_encode(df, books).collect()
        for r in codes:
            assert len(r.codes) == 4
            assert all(0 <= c < 8 for c in r.codes)
