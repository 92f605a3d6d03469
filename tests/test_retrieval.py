"""BM25 retrieval + exact heavy hitters (operators/retrieval.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from swarm_spark.operators.retrieval import bm25_topk, heavy_hitters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBM25:
    def test_tf_and_length_ranking(self, spark):
        """More hits of the term rank higher; among equal tf the
        shorter document ranks higher (length normalization)."""
        docs = _docs(
            spark,
            [
                (1, "cat cat cat dog"),
                (2, "cat dog bird fish"),
                (3, "cat cat dog bird fish worm mouse horse goat sheep"),
                (4, "dog bird"),
            ],
        )
        got = bm25_topk(docs, [("q", ["cat"])], k=10).collect()
        order = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
        assert order[0] == 1  # tf=3 in a short doc wins
        # pinned: doc2 (tf=1, dl=4) outranks doc3 (tf=2, dl=10) at
        # k1=1.2/b=0.75 — length normalization beats the extra hit here
        assert order.index(2) < order.index(3)
        assert 4 not in order  # no hit, never returned

    def test_multi_term_and_n_terms_hit(self, spark):
        docs = _docs(
            spark,
            [(1, "hash join scan"), (2, "hash hash hash"), (3, "sort merge")],
        )
        got = {
            (r["doc_id"]): r
            for r in bm25_topk(docs, [("q", ["hash", "join"])], k=5).collect()
        }
        assert got[1]["n_terms_hit"] == 2 and got[2]["n_terms_hit"] == 1
        assert 3 not in got
        # doc1 hits the rarer term too → higher total than tf-heavy doc2?
        # (not asserted as an inequality on principle — just that both
        # scores are positive integers and ranks are 1..2)
        assert sorted(r["rank"] for r in got.values()) == [1, 2]
        assert all(r["score_micro"] > 0 for r in got.values())

    def test_k_cutoff_and_tiebreak(self, spark):
        docs = _docs(spark, [(i, "same text here") for i in range(20)])
        got = bm25_topk(docs, [("q", ["same"])], k=5).collect()
        assert len(got) == 5
        # identical scores → doc_id ascending tiebreak
        assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
            0,
            1,
            2,
            3,
            4,
        ]

    def test_scores_deterministic_across_partitionings(self, spark):
        rows = [(i, " ".join(random.Random(i).choices(
            ["hash", "join", "scan", "sort", "agg"], k=12))) for i in range(60)]
        one = bm25_topk(_docs(spark, rows).coalesce(1), [("q", ["hash", "agg"])], k=8)
        many = bm25_topk(_docs(spark, rows).repartition(7), [("q", ["hash", "agg"])], k=8)
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))

    def test_empty_queries_raise(self, spark):
        docs = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            bm25_topk(docs, [])
        with pytest.raises(ValueError):
            bm25_topk(docs, [("q", [])])


class TestHeavyHitters:
    def _brute(self, spark, docs, phi_ppm):
        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        ).filter(F.col("token") != "")
        n = toks.count()
        return {
            (r["token"], r["count"])
            for r in toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") * 1_000_000 >= phi_ppm * n)
            .collect()
        }

    def test_planted_skew_exact(self, spark):
        """One token is 25% of the stream, a mid token ~2%, the rest a
        long uniform tail below threshold — across many partitions the
        MG candidates + verify return EXACTLY the brute-force set."""
        rng = random.Random(7)
        words = []
        words += ["hot"] * 1000
        words += ["warm"] * 90
        tail = [f"w{i}" for i in range(500)]
        words += rng.choices(tail, k=2910)
        rng.shuffle(words)
        rows = [(i, " ".join(words[i * 40 : (i + 1) * 40])) for i in range(100)]
        docs = _docs(spark, rows).repartition(8)
        phi = 20_000  # 2% of 4000 = 80
        got = {(r["token"], r["count"]) for r in heavy_hitters(docs, phi).collect()}
        assert got == self._brute(spark, docs, phi)
        assert ("hot", 1000) in got and ("warm", 90) in got

    def test_threshold_boundary_inclusive(self, spark):
        # 100 tokens total; "edge" appears exactly 10 times; phi=10% → kept
        words = ["edge"] * 10 + [f"t{i}" for i in range(90)]
        docs = _docs(spark, [(0, " ".join(words))]).repartition(3)
        got = {r["token"]: r["count"] for r in heavy_hitters(docs, 100_000).collect()}
        assert got == {"edge": 10}

    def test_uniform_stream_returns_empty_or_all(self, spark):
        docs = _docs(spark, [(i, f"u{i % 7}") for i in range(70)]).repartition(5)
        # each of 7 tokens is 1/7 ≈ 14.3%: phi=20% → none
        assert heavy_hitters(docs, 200_000).count() == 0
        # phi=14% → all 7
        assert heavy_hitters(docs, 140_000).count() == 7

    def test_adversarial_decrement_order(self, spark):
        """The classic MG stress: the heavy item interleaved with
        fresh distinct items that constantly trigger decrements."""
        words = []
        for i in range(300):
            words.append("hh")
            words.append(f"x{i}")
        docs = _docs(spark, [(0, " ".join(words))]).coalesce(1)
        got = {r["token"] for r in heavy_hitters(docs, 300_000).collect()}
        assert got == {"hh"}  # 300/600 = 50% ≥ 30%

    def test_phi_validation(self, spark):
        docs = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            heavy_hitters(docs, 0)
        with pytest.raises(ValueError):
            heavy_hitters(docs, 1_000_001)
        with pytest.raises(ValueError, match="MG counters"):
            heavy_hitters(docs, 1)  # 1e6 counters — refuse, use vocabulary


class TestSearchIndex:
    def _corpus(self, spark, n=40, seed=1):
        rng = random.Random(seed)
        vocab = ["hash", "join", "scan", "sort", "agg", "merge", "row", "col"]
        rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(5, 15)))) for i in range(n)]
        return _docs(spark, rows), rows

    def test_index_equals_fresh_bm25(self, spark, tmp_path):
        from swarm_spark.operators.retrieval import (
            bm25_from_index,
            build_search_index,
            heavy_hitters,  # noqa: F401  (keep import surface hot)
        )
        from swarm_spark.tablestore import IcepackCatalog

        docs, _ = self._corpus(spark)
        t = IcepackCatalog(str(tmp_path / "wh")).table("postings")
        meta = build_search_index(docs, t, target_files=8)
        assert meta["n_docs"] == 40
        qs = [("q1", ["hash", "join"]), ("q2", ["agg"])]
        fresh = sorted(map(tuple, bm25_topk(docs, qs, k=7).collect()))
        idx = sorted(map(tuple, bm25_from_index(spark, t, qs, k=7).collect()))
        assert fresh == idx
        # corpus scalars survived the token-clustering compact
        assert t.current_snapshot()["op"] == "compact"
        assert t.current_snapshot()["n_docs"] == 40
        # the clustered index actually prunes on query terms
        rep = t.prune_report([("token", "in", ["agg"])])
        assert rep["files_kept"] < rep["files_total"]

    def test_extend_equals_rebuild(self, spark, tmp_path):
        from swarm_spark.operators.retrieval import (
            bm25_from_index,
            build_search_index,
            extend_search_index,
        )
        from swarm_spark.tablestore import IcepackCatalog

        docs_a, rows_a = self._corpus(spark, n=30, seed=2)
        docs_b, rows_b = self._corpus(spark, n=10, seed=3)
        rows_b = [(i + 100, t) for i, t in rows_b]  # fresh ids
        docs_b = _docs(spark, rows_b)
        t = IcepackCatalog(str(tmp_path / "wh")).table("postings")
        build_search_index(docs_a, t)
        meta = extend_search_index(docs_b, t)
        assert meta["n_docs"] == 40
        full = _docs(spark, rows_a + rows_b)
        t2 = IcepackCatalog(str(tmp_path / "wh2")).table("postings")
        build_search_index(full, t2)
        qs = [("q", ["hash", "merge", "scan"])]
        inc = sorted(map(tuple, bm25_from_index(spark, t, qs, k=12).collect()))
        scratch = sorted(map(tuple, bm25_from_index(spark, t2, qs, k=12).collect()))
        fresh = sorted(map(tuple, bm25_topk(full, qs, k=12).collect()))
        assert inc == scratch == fresh

    def test_validation(self, spark, tmp_path):
        from swarm_spark.operators.retrieval import (
            bm25_from_index,
            extend_search_index,
        )
        from swarm_spark.tablestore import IcepackCatalog

        docs, _ = self._corpus(spark, n=5)
        t = IcepackCatalog(str(tmp_path / "wh")).table("not_an_index")
        t.append(docs)  # a table that is NOT an index
        with pytest.raises(ValueError, match="search index"):
            bm25_from_index(spark, t, [("q", ["hash"])])
        with pytest.raises(ValueError, match="search index"):
            extend_search_index(docs, t)
