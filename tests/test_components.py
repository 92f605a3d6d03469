"""Connected components / dedup clusters vs a pure-Python union-find
oracle, including chain transitivity the greedy dedup misses."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in parent}


def spark_components(spark, edges):
    from swarm_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chain_transitivity(spark):
    got = spark_components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_cycle(spark):
    got = spark_components(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    assert got == {5: 1, 1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_matches_union_find_random(spark):
    import random

    rng = random.Random(42)
    edges = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    exp = union_find(edges)
    got = spark_components(spark, edges)
    assert got == exp


def test_dedup_clusters_keeps_min_per_cluster(spark):
    from swarm_spark.operators.components import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a bigint, id_b bigint"
    )
    kept = sorted(r.doc_id for r in dedup_clusters(docs, pairs).collect())
    assert kept == [0, 3, 4]  # cluster {0,1,2}→0, singleton 3, {4,5}→4


class TestPageRank:
    """pagerank() vs an independent driver-side integer reference."""

    @staticmethod
    def _reference(edges, iterations=3, damping_ppm=850_000):
        """Plain-Python replica of the documented micro-unit math."""
        out_w: dict = {}
        for s, _d, w in edges:
            out_w[s] = out_w.get(s, 0) + w
        nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
        rank = {n: 1_000_000 for n in nodes}
        base = 1_000_000 - damping_ppm
        for _ in range(iterations):
            csum = {n: 0 for n in nodes}
            for s, d, w in edges:
                csum[d] += (rank[s] * w) // out_w[s]
            rank = {n: base + (damping_ppm * csum[n]) // 1_000_000 for n in nodes}
        return rank

    def _run(self, spark, edges, **kw):
        from swarm_spark.operators.components import pagerank

        df = spark.createDataFrame(edges, "src string, dst string, w bigint")
        got = {r["node"]: r["rank_micro"] for r in pagerank(df, weight="w", **kw).collect()}
        assert got == self._reference(edges, **kw)
        return got

    def test_triangle_with_weights(self, spark):
        got = self._run(
            spark,
            [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1)],
        )
        assert set(got) == {"a", "b", "c"}

    def test_dangling_sink_and_source(self, spark):
        # 'sink' has no out-edges (mass dropped); 'src0' has no
        # in-edges (rank = base + 0 after round 1)
        got = self._run(spark, [("src0", "mid", 1), ("mid", "sink", 1)])
        assert got["src0"] == 150_000

    def test_hub_ranks_highest(self, spark):
        edges = [(f"leaf{i}", "hub", 1) for i in range(10)]
        edges += [("hub", "leaf0", 1)]
        got = self._run(spark, edges)
        assert got["hub"] == max(got.values())

    def test_partitioning_invariance(self, spark):
        import random

        rng = random.Random(3)
        edges = [
            (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}", rng.randrange(1, 5))
            for _ in range(300)
        ]
        from swarm_spark.operators.components import pagerank

        df1 = spark.createDataFrame(edges, "src string, dst string, w bigint").coalesce(1)
        df8 = spark.createDataFrame(edges, "src string, dst string, w bigint").repartition(8)
        r1 = sorted(map(tuple, pagerank(df1, weight="w").collect()))
        r8 = sorted(map(tuple, pagerank(df8, weight="w").collect()))
        assert r1 == r8
        assert {t[0]: t[1] for t in r1} == self._reference(
            [(s, d, w) for s, d, w in edges]
        )

    def test_unweighted_default_and_validation(self, spark):
        import pytest

        from swarm_spark.operators.components import pagerank

        df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
        got = {r["node"]: r["rank_micro"] for r in pagerank(df, iterations=2).collect()}
        assert got == self._reference([("a", "b", 1), ("b", "a", 1)], iterations=2)
        with pytest.raises(ValueError):
            pagerank(df, damping_ppm=2_000_000)
