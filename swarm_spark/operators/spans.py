"""Substring/suffix-level (span) deduplication: find and remove exact
repeated k-token spans across a corpus — the third dedup granularity
next to document-level near-dup (dedup.py) and cluster-level
(components.py), and the standard LLM pre-training curation step this
suite previously lacked (the Lee et al. 2022 "50-token overlap"
family, classically built on a suffix array).

Spark-first construction (no suffix array — the same result expressed
as shuffle-bucketed relational ops, so Catalyst/AQE pick the physical
strategy):

    tokenize -> k-token rolling shingles WITH positions (narrow: one
    explode, no shuffle) -> global shingle frequency (groupBy with
    map-side partial aggregation: the shuffle moves per-partition
    DISTINCT shingles + partial counts, not token positions) ->
    left-semi join positions against the duplicated-shingle set ->
    merge runs of consecutive duplicated positions into spans with the
    islands trick (pos - row_number) -> optionally excise covered
    tokens and reassemble the text.

Scale shape at 100 TB (~25T tokens): the position table is
O(total tokens) but is only ever shuffled ONCE, on the shingle hash,
and only IF the duplicated-shingle set is too large to broadcast — in
real corpora duplicated shingles are a small fraction of all shingles,
so AQE turns the left-semi into a broadcast hash semi-join and the
flagged-position table (tiny) is the only thing the island window
shuffles. Worst case is 2 data-sized shuffles; typical is the
partial-agg count shuffle plus broadcast. A pathologically hot shingle
("the the the ...") skews neither path: the groupBy partial-aggregates
it map-side and the semi-join probe is per-row. min_freq can be raised
at corpus scale to target only heavily-repeated boilerplate.

Cross-engine parity: tokens are split on a single literal space and
shingles hashed with md5 over the space-joined window, so a DuckDB
oracle (string_split + list slicing + md5) reproduces every value
exactly — see __spark_entry__.oracle_sql()['span_dedup' / 'span_scrub'].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingle_positions(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, h): one row per k-token window, pos 1-indexed in token
    space, h = md5 of the space-joined window. Narrow (no shuffle); the
    token array never leaves the projection that explodes it."""
    from swarm_spark.operators.util import spread

    toks = F.split(F.col(text_col), " ")
    # sequence(1, n) with n < 1 would generate DESCENDING [1, 0] — gate it
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    docs = spread(docs)
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(F.concat_ws(" ", F.slice(toks, i, F.lit(k)))).alias("h"),
                    ),
                )
            ).alias("s"),
        )
        .select(id_col, F.col("s.pos").cast("long").alias("pos"), "s.h")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_freq: int = 2,
    min_run: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start, span_end,
    n_shingles), token positions inclusive and 1-indexed. A position is
    flagged when its k-shingle occurs >= min_freq times in the WHOLE
    corpus (cross- or intra-document); consecutive flagged positions
    merge into one span covering [min_pos, max_pos + k - 1]. min_run
    drops short runs — min_run=r keeps only overlaps of >= k+r-1 tokens,
    so the Lee-et-al 50-token rule is k=50/min_run=1 (or k=8/min_run=43
    when shorter shingles are reused by other stages)."""
    sh = shingle_positions(docs, k=k, text_col=text_col, id_col=id_col)
    dup = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_freq)
        .select("h")
    )
    # duplicated shingles << all shingles -> AQE broadcasts this semi-join
    flagged = sh.join(dup, "h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        flagged.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .filter(F.col("n_shingles") >= min_run)
        .drop("grp")
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_freq: int = 2,
    min_run: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Excise every duplicated span and reassemble the text: returns
    (id, clean_text, n_tokens, n_tokens_removed). Documents shorter
    than k tokens (or with no duplicated span) pass through whole; a
    document that is ENTIRELY duplicated spans comes back with
    clean_text = '' (kept as a row — dropping it is document-level
    dedup's decision, not this operator's).

    The covered-position set is derived from the merged spans (few rows)
    rather than re-exploding per-shingle coverage, then anti-joined
    against the posexploded tokens; reassembly orders by position via
    array_sort over (pos, tok) structs, which a DuckDB
    string_agg(... ORDER BY pos) reproduces exactly."""
    spans = duplicate_spans(
        docs, k=k, min_freq=min_freq, min_run=min_run,
        text_col=text_col, id_col=id_col,
    )
    covered = spans.select(
        id_col, F.explode(F.sequence("span_start", "span_end")).alias("pos")
    ).distinct()
    from swarm_spark.operators.util import spread

    toks = spread(docs).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "tok"),
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    base = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens")
    )
    return (
        base.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_tokens_kept", F.lit(0)))
            .alias("n_tokens_removed"),
        )
    )
