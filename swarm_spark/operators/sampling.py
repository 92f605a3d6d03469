"""Deterministic sampling / ordering / packing for training-data
pipelines: the operators that decide WHICH examples a run trains on
and in WHAT order — so they must be reproducible bit-for-bit from a
seed, never `rand()` (whose value depends on partitioning and retry
history).

Determinism contract shared by all three: ordering keys are
md5(seed || ':' || id) hex strings — stable across engines (the DuckDB
oracles recompute them exactly), across partitionings, and across
retries. No Python in any hot path; everything is Column expressions
inside whole-stage codegen.

Scale contract: Spark executes a GLOBAL-order window (no partitionBy)
as a single-partition sort — fine for a fixture, a scale-killer on a
corpus. So every global-order path here is (a) gated by an explicit
max_rows guard that raises with guidance (the jaccard/reassembly guard
pattern), and (b) paired with a sharded mode (shard_col) where every
window is partition-local — one shuffle on the shard key, no global
sort — and global order is the deterministic lexicographic
(position, shard) interleave. The sharded mode IS the 100 TB path;
the guard makes reaching for the toy path at scale impossible to do
silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GLOBAL_ORDER_MAX_ROWS = 10_000_000


class GlobalOrderTooLarge(RuntimeError):
    """A global-order (single-partition-sort) path was asked to order
    more than max_rows rows; use shard_col instead."""


def _hash_key(id_col: str, seed: int) -> F.Column:
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))


def _guard_global(df: DataFrame, max_rows: int, op: str) -> None:
    n = df.count()
    if n > max_rows:
        raise GlobalOrderTooLarge(
            f"{op}: {n} rows exceed max_rows={max_rows} for the global-order "
            "mode (Spark runs an unpartitioned window as ONE sort task); "
            "pass shard_col= for the partition-local mode, or raise max_rows "
            "if you accept the single-task sort"
        )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, chosen by seeded
    hash rank — the mixture-control primitive (a corpus with 90% web /
    10% code rebalances deterministically; the same seed returns the
    identical sample on any cluster, any partitioning).

    Always partition-local: one shuffle on the strata columns, the
    within-stratum hash ordering sorts inside each partition, and
    rank <= n filters inside the window stage (skewed strata sort
    more rows but never collect them). No global-order guard needed."""
    w = Window.partitionBy(*strata_cols).orderBy(_hash_key(id_col, seed), id_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    shard_col: str | None = None,
    max_rows: int = GLOBAL_ORDER_MAX_ROWS,
) -> DataFrame:
    """Deterministic training order. With shard_col (the corpus-scale
    mode): `position` is the seeded rank WITHIN the shard
    (partition-local window), and the global epoch order is the
    lexicographic (position, shard) interleave — a round-robin over
    shards, which is exactly what a multi-reader data loader consumes,
    with no global sort anywhere. Without shard_col: true global rank
    via an unpartitioned window — single sort task, guarded by
    max_rows."""
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(_hash_key(id_col, seed), id_col)
    else:
        _guard_global(df, max_rows, "seeded_shuffle")
        w = Window.orderBy(_hash_key(id_col, seed), id_col)
    return df.withColumn("position", F.row_number().over(w).cast("long") - 1)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    seed: int = 42,
    max_rows: int = GLOBAL_ORDER_MAX_ROWS,
) -> DataFrame:
    """Context-window packing: documents are laid end-to-end in seeded
    order and cut into fixed windows of max_tokens (the standard
    concat-then-slice LLM batching; a document straddling a boundary
    continues in the next pack). Emits one row per (doc, pack)
    overlap:

        ([shard], id, position, tok_start, tok_end,
         pack_id, pack_tok_start, pack_tok_end)

    where [tok_start, tok_end) is the doc's token interval in the
    concatenation and [pack_tok_start, pack_tok_end) its slice inside
    pack_id — a downstream mapInPandas tokenizer materializes pack
    tensors from exactly these intervals without re-scanning
    neighbors.

    Layout: cumulative token offsets via a window cumsum, then pack
    membership = explode(sequence(floor(start/max), floor((end-1)/max)))
    — no self-join, no iteration. With shard_col all windows are
    per-shard (one shuffle on the shard key, partition-local sorts)
    and pack_id is shard-local: the 100 TB mode, where each shard's
    packs feed one data-loader stream. Without it the cumsum is a
    single-task sort — fixture mode, guarded by max_rows."""
    order = [_hash_key(id_col, seed), id_col]
    if shard_col is not None:
        w_pos = Window.partitionBy(shard_col).orderBy(*order)
    else:
        _guard_global(df, max_rows, "pack_sequences")
        w_pos = Window.orderBy(*order)
    w_cum = w_pos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks = F.col(token_col).cast("long")
    out = (
        df.withColumn("position", F.row_number().over(w_pos).cast("long") - 1)
        .withColumn("tok_end", F.sum(toks).over(w_cum))
        .withColumn("tok_start", F.col("tok_end") - toks)
        # a 0-token doc still belongs to the pack at its offset
        .withColumn(
            "_last_pack",
            F.greatest(
                F.floor((F.col("tok_end") - 1) / max_tokens),
                F.floor(F.col("tok_start") / max_tokens),
            ),
        )
        .withColumn(
            "pack_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("tok_start") / max_tokens), F.col("_last_pack")
                )
            ),
        )
        .drop("_last_pack")
        .withColumn(
            "pack_tok_start",
            F.greatest(F.col("tok_start"), F.col("pack_id") * max_tokens),
        )
        .withColumn(
            "pack_tok_end",
            F.least(F.col("tok_end"), (F.col("pack_id") + 1) * max_tokens),
        )
    )
    cols = ([shard_col] if shard_col else []) + [
        id_col, "position", "tok_start", "tok_end",
        "pack_id", "pack_tok_start", "pack_tok_end",
    ]
    return out.select(*cols)


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain/mixture reweighting by deterministic fractional
    repetition — the "data mixing" stage of a training pipeline:
    upsample domain g by weights[g] = 2.5 means every doc appears
    twice plus a third time with probability 0.5; 0.25 downsamples to
    a 1-in-4 keep; 0 drops the domain. Unlisted groups get
    `default_weight`.

    Determinism: the fractional coin is u52 < round(frac(w)·2^52),
    where u52 is the first 13 hex chars of md5(seed:id) — a pure
    INTEGER comparison, so the decision is identical across engines
    (DuckDB oracle), partitionings, and retries; `rand()` is exactly
    what this operator exists to avoid. Expected copies per doc = w.

    Scale: pure projection + explode — per-row work, zero shuffles,
    weights as map literals (same broadcast-analogue as
    quality_model.score_text). Output adds copy_idx (0..n-1); rows
    with 0 copies disappear. Downstream seeded_shuffle over
    (id, copy_idx) gives each copy an independent training position.
    """
    bases: dict[str, int] = {}
    thrs: dict[str, int] = {}
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for {g!r}: {w}")
        bases[g] = int(w)
        thrs[g] = round((w - int(w)) * (1 << 52))
    dbase = int(default_weight)
    dthr = round((default_weight - dbase) * (1 << 52))

    def _maplit(d: dict[str, int], typ: str):
        keys = list(d.keys())
        return F.map_from_arrays(
            F.lit(keys).cast("array<string>"),
            F.lit([d[k] for k in keys]).cast(f"array<{typ}>"),
        )

    g = F.col(group_col)
    base = F.coalesce(F.element_at(_maplit(bases, "int"), g), F.lit(dbase)) \
        if bases else F.lit(dbase)
    thr = F.coalesce(F.element_at(_maplit(thrs, "long"), g), F.lit(dthr)) \
        if thrs else F.lit(dthr)
    u52 = F.conv(F.substring(_hash_key(id_col, seed), 1, 13), 16, 10).cast("long")
    n_copies = (base + (u52 < thr).cast("int")).alias("_n_copies")
    out = df.withColumn("_n_copies", n_copies)
    out = out.withColumn(
        "copy_idx",
        F.explode(
            F.when(F.col("_n_copies") > 0,
                   F.sequence(F.lit(0), F.col("_n_copies") - 1))
            .otherwise(F.array().cast("array<int>"))
        ),
    )
    return out.drop("_n_copies")


def pack_turns(
    transcripts: DataFrame,
    max_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    token_expr: F.Column | None = None,
) -> DataFrame:
    """Conversation-aware context packing for SFT-style training data:
    turns are laid out per conversation in turn order and assigned to
    fixed-budget windows WITHOUT ever splitting a turn — a training
    sample is a contiguous turn span of ONE conversation. The window
    assignment is first-fit-by-offset: a turn belongs to the window
    its starting token offset falls in (floor(tok_start/max_tokens)),
    so every cut is a turn boundary; a window may exceed max_tokens by
    at most one turn's length (and a single turn longer than the
    budget is its own over-budget window) — the deterministic,
    SQL-expressible discipline, unlike greedy bin packing whose
    assignment depends on sequential state.

    Output: (conv_col, idx_col, n_tokens, tok_start, tok_end,
    window_idx) with conversation-relative token offsets — a
    downstream tokenizer materializes window tensors from exactly
    these intervals.

    Scale: ONE shuffle on conv_col; every window function is
    conversation-partitioned (bounded by conversation length, the
    reassembly bound) — no global sort at any size, so no max_rows
    guard is needed. token_expr defaults to the single-space token
    count (size(split(text, ' ')) — the cross-engine formula the
    pack_sequences oracle pins)."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    toks = (token_expr if token_expr is not None
            else F.size(F.split(F.col("text"), " "))).cast("long")
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    cum_excl = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return (
        transcripts.withColumn("n_tokens", toks)
        .withColumn("tok_start", cum_excl)
        .withColumn("tok_end", F.col("tok_start") + F.col("n_tokens"))
        .withColumn("window_idx",
                    F.floor(F.col("tok_start") / F.lit(max_tokens)))
        .select(conv_col, idx_col, "n_tokens", "tok_start", "tok_end",
                "window_idx")
    )
