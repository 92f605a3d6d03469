"""Persistent IVF ANN index over an icepack table.

The r4 IVF pipeline (operators/similarity.py: deterministic centroid
sample → vectorized assign → probe n lists → exact re-rank) computed
its centroids and assignments PER RUN. This module persists them the
way the BM25 postings index is persisted (operators/retrieval.py
build_search_index): one icepack table of rows
(id, vector, `_list` = nearest-centroid id) with the centroid matrix
riding the snapshot's extra_meta — index data and model commit
ATOMICALLY; a crash can never leave vectors assigned to centroids
that were not committed.

The table is cluster_by("_list") compacted, so each data file holds a
tight `_list` range and a probe of n_probe lists becomes FILE
SKIPPING via the stats sidecars (`read(prune=[("_list","in",probe)])`
— the same mechanism that makes BM25 query terms prune to their
postings files). At 100 TB the probe reads n_probe/n_lists of the
corpus and the query never shuffles corpus rows.

`extend_ann_index` appends: only NEW vectors are assigned (one numpy
matmul per Arrow batch); history is never re-assigned and centroids
never drift mid-index — identical to a faiss IVF `add` after `train`.
Re-cluster on a maintenance cadence to restore per-file `_list`
locality for the appended rows.

Reference analogue: swarm persists derived routing state in BigQuery
tables rather than recomputing per ingest (pkg/usecase/ingest.go);
this is the same materialize-once contract for the ANN model.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swarm_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    ivf_topk_quantized,
)

__all__ = ["build_ann_index", "extend_ann_index", "ann_topk_from_index"]

_META_KEYS = ("ann_centroids", "ann_dim", "ann_id_col", "ann_vec_col")


def _encode_centroids(cents: np.ndarray) -> str:
    # repr-based json round-trips float64 exactly in Python
    return json.dumps([[float(x) for x in row] for row in cents])


def _decode_meta(snap: dict) -> tuple[np.ndarray, str, str]:
    if snap is None or "ann_centroids" not in snap:
        raise ValueError(
            "not an ANN index table — build it with build_ann_index first")
    cents = np.array(json.loads(snap["ann_centroids"]), dtype=np.float64)
    return cents, snap["ann_id_col"], snap["ann_vec_col"]


def build_ann_index(
    embs: DataFrame,
    table,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_files: int | None = None,
) -> dict:
    """Train (deterministic centroid sample) + assign + persist.
    One pass over the corpus: the assign is a numpy matmul per Arrow
    batch, the write is a `_list`-clustered rewrite so probes prune
    files. Returns {snapshot_id, n_centroids, n_vectors, dim}."""
    cents = ivf_centroids(embs, n_centroids, vec_col, id_col)
    dim = int(cents.shape[1])
    assigned = ivf_assign(embs, cents, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("_list"))
    meta = {
        "ann_centroids": _encode_centroids(cents),
        "ann_dim": dim,
        "ann_id_col": id_col,
        "ann_vec_col": vec_col,
    }
    snap = table.append(assigned, extra_meta=meta)
    table.compact(embs.sparkSession, cluster_by=["_list"],
                  target_files=target_files)
    return {"snapshot_id": snap["snapshot_id"],
            "n_centroids": n_centroids,
            "n_vectors": snap["added_rows"], "dim": dim}


def extend_ann_index(new_embs: DataFrame, table) -> dict:
    """Append NEW vectors (caller contract: ids not already indexed —
    same as extend_search_index): assign against the STORED centroids
    only, one matmul per Arrow batch over the increment; history is
    untouched. The centroid meta rides the new snapshot so the index
    stays self-describing at every commit."""
    prev = table.current_snapshot()
    cents, id_col, vec_col = _decode_meta(prev)
    assigned = ivf_assign(new_embs, cents, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("_list"))
    meta = {k: prev[k] for k in _META_KEYS}
    snap = table.append(assigned, extra_meta=meta)
    return {"snapshot_id": snap["snapshot_id"],
            "n_vectors_added": snap["added_rows"]}


def ann_topk_from_index(
    spark: SparkSession,
    table,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    quantized: bool = True,
) -> DataFrame:
    """Query the persisted index: pick the n_probe nearest centroids
    (driver-side, against the stored matrix), FILE-SKIP to their
    lists via the stats sidecars, exact re-rank inside. quantized=True
    uses the integer cross-engine-exact scorer (hash-verifiable with
    n_probe == n_centroids); False uses float cosine."""
    snap = table.current_snapshot()
    cents, id_col, vec_col = _decode_meta(snap)
    qn = np.array(query_vec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()
    # the probe IS partition/file pruning — only the probed lists' files scan
    assigned = table.read(spark, prune=[("_list", "in", [int(p) for p in probe])])
    fn = ivf_topk_quantized if quantized else ivf_topk
    return fn(assigned, cents, query_vec, k=k, n_probe=n_probe,
              vec_col=vec_col, id_col=id_col)
