"""Corpus retrieval operators: BM25 top-k search and exact heavy
hitters with a sketch-bounded shuffle.

Reference parity: swarm has no search operator — these extend the
engine the way its BigQuery sinks get queried downstream (ad-hoc
ranked retrieval over landed text), re-expressed Spark-first the same
way the curation operators are (SURVEY.md §2 "beyond the reference").

Engine-exactness (the repo-wide oracle discipline, cf.
textstats.doc_tfidf_topk and quality_model's milli-logits): every
hash-checked value is either an integer or the result of a chain of
IEEE-754 double ops (+,-,*,/) with identical expression trees in
Spark and DuckDB — each such op is correctly rounded, so the doubles
are bit-identical and flooring them to integer micro-units is stable.
`ln` is deliberately NOT used (libm implementations differ in the
last ulp): idf is the Robertson ratio (N - df + 0.5)/(df + 0.5)
WITHOUT the log. Per-term scores are floored to micro-units and
summed as integers (order-free), so the ranking — and therefore the
top-k SET — is deterministic across engines and partitionings.
NOTE: summing ratio-idf terms is not a monotone transform of summing
log-idf terms, so multi-term rankings can differ from textbook BM25
near ties — documented trade for exact reproducibility.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bm25_topk",
    "heavy_hitters",
    "build_search_index",
    "extend_search_index",
    "bm25_from_index",
]

_TOK_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), _TOK_SPLIT)).alias("token"),
    ).filter(F.col("token") != "")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval: for each (query_id, [terms]) return the
    top-k documents as (query_id, doc_id, score_micro, n_terms_hit,
    rank). Terms are matched on the corpus tokenizer (lower,
    whitespace). score_micro = Σ_term floor(1e6 · idf_ratio · tfnorm)
    with idf_ratio = (N - df + ½)/(df + ½) and
    tfnorm = tf(k1+1)/(tf + k1(1 − b + b·dl/avgdl)).

    Scale shape (the interesting part at 100 TB): the query-term set
    is tiny and BROADCAST; the token stream is filtered to query-term
    hits BEFORE any shuffle, so the one (doc, token) aggregation
    shuffles only matching postings — corpus-sized input, hit-sized
    shuffle. Document length rides the hit rows as a grouping key
    (functionally dependent on doc_id), so no corpus-sized (doc, dl)
    relation is ever joined back; df/N/avgdl are scalar or term-keyed
    aggregates of the already-tiny hit set. Top-k is a per-query
    window over candidates, never a global sort."""
    all_terms = sorted({t for _, ts in queries for t in ts})
    if not all_terms or not queries:
        raise ValueError("bm25_topk needs at least one query with terms")
    spark = docs.sparkSession

    # one tokenized projection feeds everything; dl (doc length) RIDES
    # the hit rows as a grouping key instead of joining a corpus-sized
    # (doc_id, dl) relation back in — the only corpus-sized work is
    # two narrow scans (scalar agg + hit filter), and the only shuffle
    # carries query-term hits
    base = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), _TOK_SPLIT).alias("_toks"),
    )
    corpus = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    hits = base.select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("token"),
    ).filter((F.col("token") != "") & F.col("token").isin(all_terms))
    tf = hits.groupBy(id_col, "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    return _rank_postings(tf, corpus, queries, k, k1, b, id_col)


def _rank_postings(tf: DataFrame, corpus: DataFrame,
                   queries: list[tuple[str, list[str]]], k: int,
                   k1: float, b: float, id_col: str) -> DataFrame:
    """Shared BM25 scoring core over a postings relation
    (id, dl, token, tf) + a 1-row corpus relation (n_docs, total_dl).
    Used by bm25_topk (fresh postings) and bm25_from_index (persisted
    postings) — both must produce identical rankings."""
    spark = tf.sparkSession
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in sorted(set(ts))],
        "query_id string, token string",
    )

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf_ratio",
            (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5)),
        )
        .withColumn(
            "avgdl", F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
        )
        .withColumn(
            "tfnorm",
            F.col("tf").cast("double") * F.lit(float(k1) + 1.0)
            / (
                F.col("tf").cast("double")
                + F.lit(float(k1))
                * (
                    F.lit(1.0 - float(b))
                    + F.lit(float(b)) * F.col("dl").cast("double") / F.col("avgdl")
                )
            ),
        )
        .withColumn(
            "term_micro",
            F.floor(F.col("idf_ratio") * F.col("tfnorm") * F.lit(1000000.0)).cast(
                "bigint"
            ),
        )
    )
    per_doc = scored.groupBy("query_id", id_col).agg(
        F.sum("term_micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_micro", "n_terms_hit", "rank")
    )


def heavy_hitters(
    df: DataFrame,
    phi_ppm: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT tokens with global frequency ≥ phi (given in parts per
    million, integer, so the threshold is engine-exact): returns
    (token, count). Two passes, NEITHER shuffles the full token
    stream:

      1. Misra–Gries per partition (mapInPandas, Arrow batches, state
         carried across batches within the partition) with
         k = ceil(1/phi) counters → candidate tokens. Guarantee: a
         token with global freq ≥ phi·n has local freq ≥ phi·n_p in
         at least one partition (else summing the per-partition
         frequencies contradicts the global bound), and MG's
         undercount is < n_p/(k+1) ≤ phi·n_p, so every true heavy
         hitter survives in some partition's candidate set. The
         shuffle moves ≤ k tokens per partition — metadata-sized.
      2. Exact verify: the candidate set (collected: ≤ k · partitions
         rows, config-sized by construction) is broadcast-filtered
         against the token stream and counted exactly; false
         positives from stage 1 fall out here. Threshold compare is
         integer: count · 1e6 ≥ phi_ppm · n_total.

    This is the standard sketch-then-verify shape for unknown-skew
    corpora: a plain groupBy(token) would shuffle EVERY distinct
    token; here the shuffle is bounded by 1/phi regardless of corpus
    size."""
    if not (0 < phi_ppm <= 1_000_000):
        raise ValueError("phi_ppm must be in (0, 1e6]")
    k = math.ceil(1_000_000 / phi_ppm)
    if k > 100_000:
        raise ValueError(
            f"phi_ppm={phi_ppm} needs {k} MG counters per partition — below "
            "1e-5 thresholds use corpus_vocabulary (full groupBy) instead"
        )
    toks = _tokens(df, text_col, id_col).select("token")

    def mg_partition(batches: Iterable) -> Iterable:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # decrement-all: O(k) amortized per eviction round
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = [
        r["token"]
        for r in toks.mapInPandas(mg_partition, "token string").distinct().collect()
    ]
    total = toks.count()
    if not candidates or total == 0:
        return df.sparkSession.createDataFrame([], "token string, count bigint")
    exact = (
        toks.filter(F.col("token").isin(candidates))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        # bigint casts: int32 literal products overflow at corpus scale
        # (count·1e6 and phi_ppm·n_total both pass 2^31 fast)
        .filter(
            F.col("count") * F.lit(1_000_000).cast("bigint")
            >= F.lit(phi_ppm).cast("bigint") * F.lit(total).cast("bigint")
        )
    )
    return exact.select("token", "count")


# ---------------------------------------------------------------------------
# persistent search index (icepack-backed postings)
# ---------------------------------------------------------------------------


def build_search_index(
    docs: DataFrame,
    table,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_files: int | None = None,
) -> dict:
    """Materialize a FULL postings index for a corpus into an icepack
    table: rows (token, doc_id in `id_col`'s name, dl, tf), corpus
    scalars (n_docs, total_dl) riding the snapshot as extra_meta so
    index data and statistics commit ATOMICALLY. The postings rewrite
    is sort-clustered on token, so a query's read(prune=[("token",
    "in", terms)]) touches only the files holding those terms — the
    file-skipping sidecar IS the term dictionary (filestats.py).

    Scale: one explode + one (doc, token) aggregation of the corpus —
    the same work bm25_topk does per query batch, paid ONCE. Index
    size ≈ distinct (doc, token) pairs."""
    base = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), _TOK_SPLIT).alias("_toks"),
    )
    stats = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    postings = (
        base.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    meta = {"n_docs": int(stats["n"]), "total_dl": int(stats["t"]), "id_col": id_col}
    snap = table.append(postings, extra_meta=meta)
    # token-clustered rewrite: per-file token ranges become tight, so
    # query-term pruning touches only the relevant files
    table.compact(postings.sparkSession, cluster_by=["token"],
                  target_files=target_files)
    return {"snapshot_id": snap["snapshot_id"], **meta}


def extend_search_index(
    new_docs: DataFrame,
    table,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally index NEW documents (ids must not already be in
    the index — same caller contract as dedup.minhash_band_index):
    appends only the new postings and commits the UPDATED corpus
    scalars in the same snapshot. History is never re-tokenized.
    Re-cluster on a maintenance cadence (maintain.py --cluster-by
    token) to restore tight per-file term ranges."""
    prev = table.current_snapshot()
    if prev is None or "n_docs" not in prev:
        raise ValueError("extend needs a search index built by build_search_index")
    base = new_docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), _TOK_SPLIT).alias("_toks"),
    )
    stats = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    postings = (
        base.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    meta = {
        "n_docs": int(prev["n_docs"]) + int(stats["n"]),
        "total_dl": int(prev["total_dl"]) + int(stats["t"]),
        "id_col": id_col,
    }
    # extra_meta uses setdefault semantics (never shadows core fields)
    # but DOES need to shadow the previous snapshot's user meta — new
    # snapshots start from a fresh dict, so this just works
    snap = table.append(postings, extra_meta=meta)
    return {"snapshot_id": snap["snapshot_id"], **meta}


def bm25_from_index(
    spark,
    table,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against a PERSISTED index: must return exactly what
    bm25_topk returns on the same corpus (pinned by the bm25_indexed
    oracle, which is the bm25 oracle verbatim). The postings scan is
    pruned to the query terms via file skipping — on a token-clustered
    index a query touches only the files containing its terms, the
    inverted-index access pattern expressed as a table scan."""
    all_terms = sorted({t for _, ts in queries for t in ts})
    if not all_terms or not queries:
        raise ValueError("bm25_from_index needs at least one query with terms")
    snap = table.current_snapshot()
    if snap is None or "n_docs" not in snap:
        raise ValueError("no search index in table; run build_search_index")
    id_col = snap.get("id_col", "doc_id")
    tf = table.read(spark, prune=[("token", "in", all_terms)])
    corpus = spark.createDataFrame(
        [(int(snap["n_docs"]), int(snap["total_dl"]))], "n_docs bigint, total_dl bigint"
    )
    return _rank_postings(tf, corpus, queries, k, k1, b, id_col)
