"""Model-based quality scoring (operators/quality_model): exact integer
logits, literal-map vs broadcast-join path equality, threshold
semantics, and the zero-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from swarm_spark.operators.quality_model import (
    LinearTextModel,
    score_text,
    score_text_joined,
    synthetic_model,
    token_buckets,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "the the the the"),
        (2, ""),
        (3, "   "),
        (4, "Unseen TOKENS with CAPS and  double  spaces"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestScoreText:
    def test_exact_logit_against_python(self, spark):
        model = synthetic_model(n_buckets=64, seed=3, bias_milli=5)
        df = score_text(_docs(spark), model)
        got = {r["doc_id"]: (r["n_tokens"], r["logit_milli"]) for r in df.collect()}
        import hashlib

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64

        for doc_id, text in [(0, "the quick brown fox"), (1, "the the the the"),
                             (4, "unseen tokens with caps and double spaces")]:
            toks = [t for t in text.lower().split() if t]
            want = 5 + sum(model.weights_milli[bucket(t)] for t in toks)
            assert got[doc_id] == (len(toks), want)

    def test_empty_and_whitespace_text(self, spark):
        model = synthetic_model(n_buckets=64, seed=3, bias_milli=42)
        got = {r["doc_id"]: (r["n_tokens"], r["logit_milli"], r["keep"])
               for r in score_text(_docs(spark), model).collect()}
        assert got[2] == (0, 42, True)   # bias only; 42 > 0*0
        assert got[3] == (0, 42, True)

    def test_sparse_model_missing_bucket_is_zero(self, spark):
        # weights cover NO buckets → logit is exactly the bias
        model = LinearTextModel(n_buckets=64, bias_milli=-7, weights_milli={})
        rows = score_text(_docs(spark), model).collect()
        assert all(r["logit_milli"] == -7 for r in rows)
        assert all(r["keep"] is False for r in rows)

    def test_mean_threshold_semantics(self, spark):
        # keep iff logit > thr * n_tokens: per-token mean threshold
        model = synthetic_model(n_buckets=64, seed=3)
        thr = LinearTextModel(n_buckets=64, weights_milli=model.weights_milli,
                              threshold_milli_per_token=10_000)  # unreachable: |w|<=1000
        rows = score_text(_docs(spark), thr).collect()
        assert all(not r["keep"] for r in rows if r["n_tokens"] > 0)

    def test_no_shuffle_in_plan(self, spark):
        model = synthetic_model(n_buckets=1024, seed=7)
        plan = score_text(_docs(spark), model)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection at scan speed


class TestJoinedPathEquality:
    def test_literal_and_joined_agree(self, spark):
        model = synthetic_model(n_buckets=256, seed=11, bias_milli=3)
        docs = _docs(spark)
        lit = score_text(docs, model).select("doc_id", "n_tokens", "logit_milli", "keep")
        wdf = spark.createDataFrame(
            [(b, w) for b, w in model.weights_milli.items()],
            "bucket int, w_milli long")
        joined = score_text_joined(docs, wdf, model).select(
            "doc_id", "n_tokens", "logit_milli", "keep")
        assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, joined.collect()))

    def test_joined_uses_broadcast(self, spark):
        model = synthetic_model(n_buckets=256, seed=11)
        wdf = spark.createDataFrame(
            [(b, w) for b, w in model.weights_milli.items()],
            "bucket int, w_milli long")
        plan = score_text_joined(_docs(spark), wdf, model)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


class TestTokenBuckets:
    def test_buckets_in_range_and_deterministic(self, spark):
        df = _docs(spark).select(token_buckets("text", 32).alias("b"))
        twice = _docs(spark).select(token_buckets("text", 32).alias("b"))
        a = [r["b"] for r in df.collect()]
        assert a == [r["b"] for r in twice.collect()]
        assert all(0 <= x < 32 for row in a for x in row)


def test_huge_sparse_model_refused_with_guidance(spark):
    from swarm_spark.operators.quality_model import (
        DENSE_ARRAY_MAX_BUCKETS, LinearTextModel, score_text)

    n = DENSE_ARRAY_MAX_BUCKETS * 2
    big = LinearTextModel(n_buckets=n,
                          weights_milli={b: 1 for b in range(200)})
    try:
        score_text(_docs(spark), big)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "score_text_joined" in str(e)
