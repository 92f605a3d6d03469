"""Connected components over near-duplicate pairs — the transitive
closure step that turns pairwise matches into dedup CLUSTERS.

Greedy pair-removal (dedup_minhash) under-merges chains (a~b, b~c but
a!~c leaves two clusters). The standard distributed fix is iterative
min-label propagation; this implements the hash-to-min scheme
(Rastogi et al., "Finding Connected Components in Map-Reduce", ICDE'13
family): each round, every node hooks its whole neighborhood to the
minimum of that neighborhood, shrinking every component toward a star
rooted at its min id. One groupBy + one join shuffle per round;
converges in O(log n) rounds (near-dup clusters are tiny, so 2-4
rounds in practice). DataFrame-only: no RDDs, no driver-side graph.
Lineage is truncated per round with localCheckpoint so the plan
doesn't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()


def _star_round(edges: DataFrame) -> DataFrame:
    # neighborhood = edges in both directions + self
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = both.groupBy("src").agg(F.min("dst").alias("m"))
    mins = mins.withColumn("m", F.least("src", "m"))
    # hook every neighbor (and the node itself) to the neighborhood min
    hooked = (
        both.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return _canonical(hooked)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the cluster.
    Input: undirected edge list (near-dup pairs). Isolated nodes are
    not emitted (callers left-join and coalesce to self)."""
    edges = _canonical(
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint()
    for _ in range(max_rounds):
        nxt = _star_round(edges).localCheckpoint()
        # fixpoint when the edge set stops changing — ONE job per
        # round: tag-union both (checkpointed) sets and compare
        # (count, hash-sum) signatures, instead of count + count +
        # exceptAll (3 jobs, one with a full shuffle)
        sig = {
            r["t"]: (r["n"], r["h"])
            for r in edges.select(F.lit(0).alias("t"), "src", "dst")
            .unionByName(nxt.select(F.lit(1).alias("t"), "src", "dst"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("n"),
                 # decimal(38,0) accumulator: exact, no ANSI long
                 # overflow no matter the edge count
                 F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"))
            .collect()
        }
        if sig.get(0) == sig.get(1):
            edges = nxt
            break
        edges = nxt
    # after convergence the edge set is a star per component in
    # canonical (min, node) order: src IS the component root
    comp = edges.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    comp = comp.groupBy("node").agg(F.min("component").alias("component"))
    roots = comp.select(F.col("component").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (the min id) per connected near-dup
    cluster; singletons pass through."""
    comp = connected_components(pairs)
    joined = df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    return joined.filter(F.col(id_col) == F.col("component")).drop("component")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_ppm: int = 850_000,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list, ENGINE-EXACT: all
    arithmetic is bigint micro-units with floor division, so the
    ranks after any fixed iteration count are bit-identical across
    engines, partitionings and retries — an unrolled DuckDB CTE
    reproduces them exactly (oracle `pagerank`). Returns
    (node, rank_micro) for every node that appears as src or dst.

    rank⁰ = 1e6 per node; per iteration
        contrib(e) = (rank(src)·w(e)) div out_w(src)
        rank'(v)   = (1e6 − d) + (d · Σ contrib) div 1e6
    with d = damping_ppm. Dangling-node mass is dropped (documented
    semantic choice — redistribution would add an all-nodes broadcast
    per round; ranks then sum to < N·1e6, which is fine for ranking).

    Scale shape: out-weights are computed once and stay joined to the
    static edge relation; each iteration is ONE shuffle (contribs
    grouped by dst) plus a broadcast-friendly join of the (node, rank)
    relation — the standard Pregel-on-DataFrames layout. Lineage is
    cut per round with localCheckpoint (cf. connected_components), so
    the plan stays flat for any iteration count. Overflow bound:
    rank·w must stay under 2^63 — ranks are ≤ N·1e6 total mass, so
    with bigint weights keep N·1e6·max_w < 9.2e18 (raise: split
    weights or rescale)."""
    if not (0 <= damping_ppm <= 1_000_000):
        raise ValueError("damping_ppm must be in [0, 1e6]")
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = e.join(out_w, "src").localCheckpoint()  # static: edges + degrees
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    base = F.lit(1_000_000 - damping_ppm).cast("bigint")
    ranks = nodes.select("node", F.lit(1_000_000).cast("bigint").alias("rank_micro"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(rank_micro * w) div out_w").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damping_ppm} * coalesce(csum, 0)) div 1000000"
                    ).cast("bigint")
                ).alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks
