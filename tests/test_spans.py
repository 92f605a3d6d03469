"""Span (substring-level) dedup: planted-overlap unit tests.

The corpus below plants every interesting case explicitly so expected
spans are hand-computable; the sf-scale value check against the DuckDB
oracle lives in __spark_entry__.oracle_sql()['span_dedup'/'span_scrub']
(driver gate + tools/check_correctness.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.operators.spans import (
    duplicate_spans,
    scrub_duplicate_spans,
    shingle_positions,
)

K = 4

# tokens are single letters for readability; k=4 shingles
DOCS = [
    # d1/d2 share the 6-token run "a b c d e f" -> flagged shingle
    # positions 1,2,3 in both -> ONE span [1, 6] (3 shingles) each
    (1, "a b c d e f x1 y1 z1 w1"),
    (2, "a b c d e f x2 y2 z2 w2"),
    # d3 repeats a 4-token phrase INTRA-doc: positions 1 and 7
    # both hold "p q r s" -> two 1-shingle spans [1,4] and [7,10]
    (3, "p q r s g3 h3 p q r s"),
    # d4 is shorter than k tokens -> zero shingles, never flagged
    (4, "u v w"),
    # d5/d6 are exact duplicates -> every position flagged -> one
    # full-doc span each; scrub empties them
    (5, "m n o p q"),
    (6, "m n o p q"),
    # d7 shares nothing
    (7, "t7 u7 v7 w7 x7 y7"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_shingle_positions_count_and_indexing(docs):
    sh = shingle_positions(docs, k=K).collect()
    per_doc = {}
    for r in sh:
        per_doc.setdefault(r.doc_id, []).append(r.pos)
    # n_tokens - k + 1 shingles, positions 1..n-k+1, none for short docs
    assert sorted(per_doc[1]) == list(range(1, 8))
    assert sorted(per_doc[3]) == list(range(1, 8))
    assert 4 not in per_doc
    assert sorted(per_doc[5]) == [1, 2]


def test_duplicate_spans_planted(docs):
    spans = {
        (r.doc_id, r.span_start, r.span_end): r.n_shingles
        for r in duplicate_spans(docs, k=K).collect()
    }
    assert spans[(1, 1, 6)] == 3 and spans[(2, 1, 6)] == 3
    assert spans[(3, 1, 4)] == 1 and spans[(3, 7, 10)] == 1
    assert spans[(5, 1, 5)] == 2 and spans[(6, 1, 5)] == 2
    assert not any(d in (4, 7) for d, _, _ in spans)
    assert len(spans) == 6


def test_min_run_filters_short_overlaps(docs):
    spans = duplicate_spans(docs, k=K, min_run=2).collect()
    ids = sorted({r.doc_id for r in spans})
    # d3's two 1-shingle repeats drop; the >=k+1-token overlaps stay
    assert ids == [1, 2, 5, 6]


def test_min_freq_three_keeps_only_triplicates(spark, docs):
    extra = spark.createDataFrame([(8, "a b c d e f q8 r8 s8 t8")],
                                  ["doc_id", "text"])
    spans = duplicate_spans(docs.union(extra), k=K, min_freq=3).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans} == {
        (1, 1, 6), (2, 1, 6), (8, 1, 6)
    }


def test_scrub_excises_and_reassembles(docs):
    out = {r.doc_id: r for r in scrub_duplicate_spans(docs, k=K).collect()}
    assert out[1].clean_text == "x1 y1 z1 w1"
    assert out[1].n_tokens == 10 and out[1].n_tokens_removed == 6
    # intra-doc repeat: both copies of "p q r s" go (exact span dedup
    # removes every occurrence; keep-first is a policy layered above)
    assert out[3].clean_text == "g3 h3"
    # short doc and unique doc untouched
    assert out[4].clean_text == "u v w" and out[4].n_tokens_removed == 0
    assert out[7].clean_text == DOCS[6][1]
    # fully-duplicated docs stay as rows with empty text
    assert out[5].clean_text == "" and out[5].n_tokens_removed == 5
    assert len(out) == len(DOCS)


def test_semi_join_is_broadcast_at_small_dup_set(docs):
    """AQE should turn the positions-vs-dup-set semi join into a
    broadcast; assert the final plan has no sort-merge join on h."""
    spans = duplicate_spans(docs, k=K)
    spans.collect()  # let AQE finalize
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_entry_queries_run(spark, sf_dir):
    import __spark_entry__ as e

    spans = e.q_span_dedup(spark, sf_dir)
    scrub = e.q_span_scrub(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert scrub.count() == n_docs  # scrub keeps every doc as a row
    assert spans.columns == ["doc_id", "span_start", "span_end", "n_shingles"]
