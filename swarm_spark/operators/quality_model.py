"""Model-based quality scoring: a fasttext-style linear classifier over
hashed bag-of-words features, evaluated as pure Column expressions.

The standard corpus-curation stage this implements: an offline-trained
linear model (weights over hashed token buckets) scores every document
and the pipeline keeps documents whose logit clears a threshold — the
"quality classifier" filter of CCNet/fasttext-style pipelines
(reference analogue: swarm routes/filters records through compiled
rule predicates, pkg/usecase/ingest.go; here the predicate is a
learned linear scorer instead of a hand-written rule).

100 TB design:
* Scoring is a PER-ROW projection — tokenize, hash each token to a
  bucket (first 8 hex chars of md5, engine-portable), look the bucket
  up in a map literal, integer-sum — no explode, no shuffle, no Python;
  the whole thing runs inside WholeStageCodegen at scan speed.
* The model ships as a plan literal (create_map) for vocabularies up
  to ~100k buckets — the Catalyst equivalent of a broadcast variable.
  For larger vocabularies `score_text_joined` explodes tokens and
  broadcast-joins a weights DataFrame (one narrow shuffle back to
  doc_id) — same results, tested equal.
* All arithmetic is INTEGER (milli-weights): the logit is an exact
  BIGINT, so results are independent of summation order / FP
  associativity across partitions AND engines — the DuckDB oracle
  matches bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative constant — used only by the synthetic demo model
_MIX = 2654435761


@dataclass(frozen=True)
class LinearTextModel:
    """Linear classifier over hashed token buckets. Weights are in
    MILLI units (integer thousandths) so scoring stays in exact
    integer arithmetic end to end."""

    n_buckets: int
    bias_milli: int = 0
    weights_milli: dict[int, int] = field(default_factory=dict)
    # keep iff logit_milli > threshold_milli_per_token * n_tokens
    # (integer-exact mean-logit threshold)
    threshold_milli_per_token: int = 0


def synthetic_model(n_buckets: int = 1024, seed: int = 7,
                    bias_milli: int = 0) -> LinearTextModel:
    """Deterministic dense demo model: w_b = ((b*MIX + seed) % 2001) - 1000
    ∈ [-1000, 1000]. Used by tests and the oracle query (the oracle
    recomputes the same formula analytically, proving the map-literal
    lookup applies weights correctly)."""
    w = {b: ((b * _MIX + seed) % 2001) - 1000 for b in range(n_buckets)}
    return LinearTextModel(n_buckets=n_buckets, bias_milli=bias_milli,
                           weights_milli=w)


def _tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != "")


def token_buckets(col, n_buckets: int) -> Column:
    """Array of hashed feature buckets for each whitespace token:
    first 8 hex chars of md5(token) as an int, mod n_buckets —
    the engine-portable feature hash (same idiom as the sampling /
    simhash operators)."""
    return F.transform(
        _tokens(col),
        lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                   .cast("long") % n_buckets).cast("int"),
    )


DENSE_ARRAY_MAX_BUCKETS = 65536
SPARSE_MAP_MAX_WEIGHTS = 128


def score_text(df: DataFrame, model: LinearTextModel,
               text_col: str = "text") -> DataFrame:
    """Add n_tokens / logit_milli / keep columns. Pure projection:
    zero shuffles, model embedded as a plan literal.

    Lookup strategy (measured at sf1, 50k docs: 11.9 s → 3.1 s):
    Spark's GetMapValue on a map literal is a LINEAR SCAN of the
    entries, so a dense map costs O(|weights|) per token. Models with
    n_buckets <= DENSE_ARRAY_MAX_BUCKETS therefore ship as a dense
    ARRAY literal indexed by bucket (O(1) element_at; absent buckets
    hold 0). A tiny sparse dict still uses the map (scan length =
    len(weights), not n_buckets). Anything else would be a silent
    O(|weights|)-per-token scale trap — refused with guidance to
    score_text_joined (the broadcast-join path)."""
    if not model.weights_milli:
        lookup = lambda b: F.lit(0).cast("long")  # noqa: E731
    elif model.n_buckets <= DENSE_ARRAY_MAX_BUCKETS:
        dense = [int(model.weights_milli.get(b, 0)) for b in range(model.n_buckets)]
        arr = F.lit(dense).cast("array<long>")
        lookup = lambda b: F.element_at(arr, b + 1)  # noqa: E731
    elif len(model.weights_milli) <= SPARSE_MAP_MAX_WEIGHTS:
        keys = list(model.weights_milli.keys())
        vals = [model.weights_milli[k] for k in keys]
        wmap = F.map_from_arrays(
            F.lit(keys).cast("array<int>"), F.lit(vals).cast("array<long>"))
        lookup = lambda b: F.coalesce(F.element_at(wmap, b), F.lit(0).cast("long"))  # noqa: E731
    else:
        raise ValueError(
            f"model has {len(model.weights_milli)} weights over "
            f"{model.n_buckets} buckets: a map literal would linear-scan "
            "per token. Use score_text_joined (broadcast weights table)."
        )
    # note: no spread() here — the dense-array lookup fold is cheap
    # enough that a parallelism-floor shuffle costs more than it saves
    # (measured 0.7 s -> 1.1 s at sf0.1)
    buckets = token_buckets(text_col, model.n_buckets)
    logit = F.aggregate(
        buckets, F.lit(int(model.bias_milli)).cast("long"),
        lambda acc, b: acc + lookup(b))
    n_tok = F.size(buckets).cast("long")
    df = df.withColumn("n_tokens", n_tok).withColumn("logit_milli", logit)
    return df.withColumn(
        "keep",
        F.col("logit_milli")
        > F.lit(int(model.threshold_milli_per_token)) * F.col("n_tokens"),
    )


def score_text_joined(df: DataFrame, weights_df: DataFrame,
                      model: LinearTextModel, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Large-vocabulary path: explode token buckets, broadcast-join
    `weights_df` (bucket:int, w_milli:long), re-aggregate per doc.
    Identical results to score_text (tested); use when the weight
    table is too large for a plan literal but still broadcastable.
    One narrow shuffle (re-agg on id_col); the join itself is
    broadcast, never sort-merge."""
    buckets = df.select(
        F.col(id_col),
        F.explode_outer(token_buckets(text_col, model.n_buckets)).alias("bucket"),
    )
    joined = buckets.join(F.broadcast(weights_df), "bucket", "left")
    agg = joined.groupBy(id_col).agg(
        F.count(F.col("bucket")).alias("n_tokens"),
        (F.lit(int(model.bias_milli))
         + F.coalesce(F.sum("w_milli"), F.lit(0))).alias("logit_milli"),
    )
    out = df.join(agg, id_col, "left")
    return out.withColumn(
        "keep",
        F.col("logit_milli")
        > F.lit(int(model.threshold_milli_per_token)) * F.col("n_tokens"),
    )
