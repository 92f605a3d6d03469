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


class TestIvfPq:
    def _index(self, spark, tmp_path, df):
        from swarm_spark.operators.ann_index import build_ann_index
        from swarm_spark.tablestore import IcepackCatalog

        t = IcepackCatalog(str(tmp_path)).table("ann")
        out = build_ann_index(df, t, n_centroids=4, pq_m=4, pq_k=8,
                              pq_iterations=1, target_files=4)
        assert out["pq"] is True
        return t

    def test_full_probe_adc_equals_pq_topk(self, spark, tmp_path):
        from swarm_spark.operators.ann_index import ann_topk_from_index

        df = _vectors(spark, n=200, dim=16)
        t = self._index(spark, tmp_path, df)
        books = pq_train(df, dim=16, m=4, k=8, iterations=1)
        codes = pq_encode(df, books)
        q = list(df.filter(F.col("vec_id") == 5).first()["embedding"])
        direct = [(r.vec_id, r.adc) for r in pq_topk(codes, books, q, k=10).collect()]
        via_index = [(r.vec_id, r.adc) for r in ann_topk_from_index(
            spark, t, q, k=10, n_probe=4, mode="adc").collect()]
        assert direct == via_index

    def test_extend_encodes_with_stored_books(self, spark, tmp_path):
        from swarm_spark.operators.ann_index import (
            ann_topk_from_index, extend_ann_index)

        df = _vectors(spark, n=200, dim=16)
        first, second = (df.filter(F.col("vec_id") < 100),
                         df.filter(F.col("vec_id") >= 100))
        t = self._index(spark, tmp_path, first)
        extend_ann_index(second, t)
        # rebuild-on-first-half books, encode ALL, full-probe ADC must
        # equal the extended index's full-probe ADC
        books = pq_train(first, dim=16, m=4, k=8, iterations=1)
        codes = pq_encode(df, books)
        q = list(df.filter(F.col("vec_id") == 150).first()["embedding"])
        direct = [(r.vec_id, r.adc) for r in pq_topk(codes, books, q, k=10).collect()]
        via = [(r.vec_id, r.adc) for r in ann_topk_from_index(
            spark, t, q, k=10, n_probe=4, mode="adc").collect()]
        assert direct == via

    def test_adc_on_plain_index_rejected(self, spark, tmp_path):
        from swarm_spark.operators.ann_index import (
            ann_topk_from_index, build_ann_index)
        from swarm_spark.tablestore import IcepackCatalog

        df = _vectors(spark, n=50, dim=16)
        t = IcepackCatalog(str(tmp_path)).table("ann")
        build_ann_index(df, t, n_centroids=2)
        with pytest.raises(ValueError, match="IVF-PQ"):
            ann_topk_from_index(spark, t, [0.0] * 16, mode="adc")

    def test_narrow_probe_prunes_files(self, spark, tmp_path):
        df = _vectors(spark, n=200, dim=16)
        t = self._index(spark, tmp_path, df)
        rep = t.prune_report([("_list", "in", [0])])
        assert rep["files_kept"] < rep["files_total"]
