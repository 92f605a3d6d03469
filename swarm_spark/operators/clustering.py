"""K-means clustering over embedding columns — Lloyd's algorithm on
DataFrames, ENGINE-EXACT.

The repo-wide oracle discipline applied to an iterative ML kernel:
every quantity that crosses an engine boundary is an integer.
Embeddings are quantized once (q_i = floor(emb_i · 1e6) on the
float→double-exact cast), distances are integer sums of squares
(order-free), centroid updates are floor(mean) where the mean is ONE
correctly-rounded double division (identical in every IEEE engine),
and argmin ties break on the lowest centroid id. Given the same
deterministic init (the k lowest-id vectors), the assignment after
any fixed iteration count is bit-identical across engines,
partitionings, and retries — pinned by the `kmeans` oracle, which
unrolls the same iterations as DuckDB CTEs.

Scale shape (100 TB): the vector relation is NEVER shuffled. Each
iteration is (a) a narrow assignment projection — k integer
fold-expressions over the array column, whole-stage codegen'd — and
(b) a centroid update that shuffles only k·d partial sums per
partition (posexplode → groupBy(cluster, dim) with map-side combine).
Centroids live on the driver between iterations (k·d ints,
config-sized — the same contract as similarity.py's IVF centroids).
Empty clusters keep their previous centroid (documented; k never
shrinks mid-run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans", "fit_centroids"]

QUANT = 1_000_000.0


def _quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(QUANT)).cast("bigint"),
        ).alias("q"),
    )


def _dist_expr(centroid: list[int]):
    """Integer squared L2 distance between the quantized array column
    and one literal centroid — a zip_with/aggregate fold, JVM-side."""
    lit_c = F.array(*[F.lit(int(v)).cast("bigint") for v in centroid])
    return F.aggregate(
        F.zip_with(F.col("q"), lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster vectors into k groups; returns (id_col, cluster, dist)
    where `cluster` is the 0-based centroid index after `iterations`
    assign→update rounds plus a final assignment, and `dist` the
    integer quantized squared distance to that centroid.

    Init: the k vectors with the lowest ids (deterministic; callers
    wanting k-means++ can pre-seed by passing a pre-shuffled id
    ordering — determinism is the contract here)."""
    if k < 1 or iterations < 0:
        raise ValueError("k >= 1 and iterations >= 0 required")
    vecs = _quantized(df, vec_col, id_col)
    centroids = fit_centroids(vecs, k, iterations, id_col=id_col)
    return _assigned(vecs, centroids, id_col).select(id_col, "cluster", "dist")


def _assigned(vs: DataFrame, centroids: list[list[int]],
              id_col: str) -> DataFrame:
    dists = F.array(*[_dist_expr(c) for c in centroids])
    return vs.select(
        F.col(id_col),
        "q",
        # first index of the minimum = lowest centroid id tiebreak
        (F.array_position(dists, F.array_min(dists)) - 1).alias("cluster"),
        F.array_min(dists).alias("dist"),
    )


def fit_centroids(vecs: DataFrame, k: int, iterations: int,
                  id_col: str = "vec_id") -> list[list[int]]:
    """Lloyd's rounds over an already-quantized (id, q) relation;
    returns the final centroids (k lists of quantized ints). Shared by
    kmeans() and product quantization (similarity.pq_train, which fits
    one codebook per subvector slice). Same determinism contract:
    lowest-id init, floor-mean updates, empty clusters keep their
    previous centroid."""
    init = vecs.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"k={k} but only {len(init)} vectors")
    centroids: list[list[int]] = [list(r["q"]) for r in init]
    dim = len(centroids[0])
    for _ in range(iterations):
        a = _assigned(vecs, centroids, id_col)
        upd = (
            a.select("cluster", F.posexplode("q").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cluster",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n").cast("double"))
                .cast("bigint")
                .alias("c"),
            )
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty cluster keeps old centroid
        for r in upd:
            nxt[int(r["cluster"])][int(r["i"])] = int(r["c"])
        centroids = nxt
        if dim and any(len(c) != dim for c in centroids):  # pragma: no cover
            raise RuntimeError("ragged embedding arrays")
    return centroids
