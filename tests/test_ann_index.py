"""Persistent IVF ANN index (operators/ann_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.operators.ann_index import (
    ann_topk_from_index,
    build_ann_index,
    extend_ann_index,
)
from swarm_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_topk_quantized,
)
from swarm_spark.tablestore import IcepackCatalog


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vec(embs, vid=1):
    return [r[0] for r in embs.filter(F.col("vec_id") == vid)
            .select(F.explode("embedding")).collect()]


def _rows(df):
    return [tuple(r) for r in df.collect()]


class TestBuildAndQuery:
    def test_indexed_equals_fresh_pipeline(self, spark, embs, tmp_path):
        """With n_probe == n_centroids the probe covers every list, so
        indexed and per-run IVF must return the EXACT same quantized
        top-10 (both equal brute force)."""
        t = IcepackCatalog(str(tmp_path)).table("ann")
        rep = build_ann_index(embs, t, n_centroids=8)
        assert rep["n_vectors"] == embs.count() and rep["dim"] == 64
        q = _query_vec(embs)
        got = _rows(ann_topk_from_index(spark, t, q, k=10, n_probe=8))
        cents = ivf_centroids(embs, 8)
        want = _rows(ivf_topk_quantized(ivf_assign(embs, cents), cents,
                                        q, k=10, n_probe=8))
        assert got == want

    def test_probe_is_file_skipping(self, spark, embs, tmp_path):
        """After the _list-clustered compact, a 1-list probe must SKIP
        files — the index's whole point at scale."""
        t = IcepackCatalog(str(tmp_path)).table("ann")
        build_ann_index(embs, t, n_centroids=8, target_files=8)
        rep = t.prune_report([("_list", "in", [0])])
        assert rep["files_total"] >= 4
        assert rep["files_kept"] < rep["files_total"]

    def test_query_unbuilt_table_raises(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("empty")
        t.append_df = None
        with pytest.raises((ValueError, FileNotFoundError)):
            ann_topk_from_index(spark, t, [0.0] * 64)


class TestExtend:
    def test_extend_equals_rebuild_at_full_probe(self, spark, embs, tmp_path):
        """build(first half) + extend(second half) answers queries
        identically to build(everything): at n_probe == n_lists both
        equal the brute-force quantized top-k, regardless of which
        centroids each index trained on."""
        mid = embs.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
        first = embs.filter(F.col("vec_id") <= mid)
        rest = embs.filter(F.col("vec_id") > mid)

        inc = IcepackCatalog(str(tmp_path)).table("inc")
        build_ann_index(first, inc, n_centroids=8)
        rep = extend_ann_index(rest, inc)
        assert rep["n_vectors_added"] == rest.count()
        assert inc.read(spark).count() == embs.count()

        full = IcepackCatalog(str(tmp_path)).table("full")
        build_ann_index(embs, full, n_centroids=8)

        q = _query_vec(embs)
        got = _rows(ann_topk_from_index(spark, inc, q, k=10, n_probe=8))
        want = _rows(ann_topk_from_index(spark, full, q, k=10, n_probe=8))
        assert got == want

    def test_extend_never_reassigns_history(self, spark, embs, tmp_path):
        """The increment appends exactly its own rows; prior
        assignments are byte-stable (same dirs, untouched)."""
        mid = embs.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
        t = IcepackCatalog(str(tmp_path)).table("stab")
        build_ann_index(embs.filter(F.col("vec_id") <= mid), t, n_centroids=8)
        dirs_before = list(t.current_snapshot()["data_dirs"])
        before = sorted(_rows(t.read(spark).select("vec_id", "_list")))
        extend_ann_index(embs.filter(F.col("vec_id") > mid), t)
        after_dirs = t.current_snapshot()["data_dirs"]
        assert after_dirs[:len(dirs_before)] == dirs_before  # append-only
        mid_rows = sorted(_rows(
            t.read(spark).filter(F.col("vec_id") <= mid)
            .select("vec_id", "_list")))
        assert mid_rows == before  # history assignments unchanged

    def test_extend_unbuilt_raises(self, spark, embs, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("raw")
        t.append(embs.limit(5))
        with pytest.raises(ValueError, match="build_ann_index"):
            extend_ann_index(embs.limit(5), t)


class TestRecall:
    def test_partial_probe_recall(self, spark, embs, tmp_path):
        """n_probe=4 of 8 lists must keep ≥6/10 of the exact top-10 —
        the production approximate path, pinned like ann_ivf's."""
        t = IcepackCatalog(str(tmp_path)).table("rec")
        build_ann_index(embs, t, n_centroids=8)
        q = _query_vec(embs)
        exact = {r[0] for r in
                 _rows(ann_topk_from_index(spark, t, q, k=10, n_probe=8))}
        approx = {r[0] for r in
                  _rows(ann_topk_from_index(spark, t, q, k=10, n_probe=4))}
        assert len(exact & approx) >= 6
