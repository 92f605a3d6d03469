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
