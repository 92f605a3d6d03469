"""Integer-exact k-means (operators/clustering.py)."""

from __future__ import annotations

import math
import random

import pytest

from swarm_spark.operators.clustering import kmeans


def _reference(rows, k, iterations):
    """Driver-side replica of the documented integer math."""
    vecs = {vid: [math.floor(x * 1_000_000.0) for x in emb] for vid, emb in rows}
    cents = [list(vecs[vid]) for vid in sorted(vecs)[:k]]

    def assign():
        out = {}
        for vid, q in vecs.items():
            dists = [sum((a - b) * (a - b) for a, b in zip(q, c)) for c in cents]
            best = min(range(k), key=lambda i: (dists[i], i))
            out[vid] = (best, dists[best])
        return out

    for _ in range(iterations):
        a = assign()
        for cid in range(k):
            members = [vecs[v] for v, (c, _) in a.items() if c == cid]
            if members:
                cents[cid] = [
                    math.floor(float(sum(col)) / float(len(members)))
                    for col in zip(*members)
                ]
    return {vid: (c, d) for vid, (c, d) in assign().items()}


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


class TestKMeans:
    def test_planted_blobs_recovered(self, spark):
        rng = random.Random(11)
        rows = []
        for i in range(90):
            blob = i % 3
            center = [float(blob * 10)] * 4
            rows.append((i, [c + rng.uniform(-0.5, 0.5) for c in center]))
        got = {r["vec_id"]: r["cluster"] for r in kmeans(_df(spark, rows), k=3, iterations=3).collect()}
        # every blob lands in exactly one cluster
        for blob in range(3):
            assert len({got[i] for i in range(90) if i % 3 == blob}) == 1
        assert len(set(got.values())) == 3

    def test_matches_reference_and_partitioning_invariant(self, spark):
        rng = random.Random(5)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
        want = _reference(rows, k=4, iterations=2)
        got1 = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in kmeans(_df(spark, rows).coalesce(1), k=4, iterations=2).collect()
        }
        got8 = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in kmeans(_df(spark, rows).repartition(8), k=4, iterations=2).collect()
        }
        assert got1 == want and got8 == want

    def test_iterations_zero_assigns_to_init(self, spark):
        rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [10.1, 10.0]), (3, [0.1, 0.0])]
        got = {r["vec_id"]: r["cluster"] for r in kmeans(_df(spark, rows), k=2, iterations=0).collect()}
        assert got == {0: 0, 1: 1, 2: 1, 3: 0}

    def test_duplicate_init_and_empty_cluster(self, spark):
        # ids 0 and 1 are identical → both init centroids coincide;
        # round 1 ties everything into cluster 0, cluster 1 goes EMPTY
        # and keeps its [0,0] centroid — which then reclaims the zero
        # points in round 2 (the kept centroid is closer than the
        # moved mean). Must match the reference exactly, no crash.
        rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])]
        got = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in kmeans(_df(spark, rows), k=2, iterations=2).collect()
        }
        assert got == _reference(rows, k=2, iterations=2)
        assert got[0][0] == 1 and got[2][0] == 0  # pinned: reclaim happened

    def test_validation(self, spark):
        rows = [(0, [0.0]), (1, [1.0])]
        with pytest.raises(ValueError, match="only 2 vectors"):
            kmeans(_df(spark, rows), k=5)
        with pytest.raises(ValueError):
            kmeans(_df(spark, rows), k=0)
