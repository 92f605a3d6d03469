"""Deterministic sampling / ordering / packing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.operators.sampling import (
    GlobalOrderTooLarge,
    mixture_resample,
    pack_sequences,
    seeded_shuffle,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de", f"src{i % 2}") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


class TestStratifiedSample:
    def test_exact_counts_and_determinism(self, docs):
        out = stratified_sample(docs, ["lang", "source"], 5, seed=1)
        sizes = {(r.lang, r.source): r["count"]
                 for r in out.groupBy("lang", "source").count().collect()}
        assert set(sizes.values()) == {5}  # every stratum has >=5 here
        again = stratified_sample(docs, ["lang", "source"], 5, seed=1)
        assert sorted(r.doc_id for r in out.collect()) == \
               sorted(r.doc_id for r in again.collect())

    def test_small_stratum_kept_whole_and_seed_changes_pick(self, spark, docs):
        extra = spark.createDataFrame([(999, "fr", "srcX")],
                                      "doc_id long, lang string, source string")
        out = stratified_sample(docs.union(extra), ["lang"], 5, seed=1)
        assert [r.doc_id for r in out.collect() if r.lang == "fr"] == [999]
        a = {r.doc_id for r in stratified_sample(docs, ["lang"], 5, seed=1).collect()}
        b = {r.doc_id for r in stratified_sample(docs, ["lang"], 5, seed=2).collect()}
        assert a != b  # different seed, different (deterministic) sample


class TestSeededShuffle:
    def test_positions_are_dense_per_shard(self, docs):
        out = seeded_shuffle(docs, seed=3, shard_col="lang")
        per = {}
        for r in out.collect():
            per.setdefault(r.lang, []).append(r.position)
        for lang, ps in per.items():
            assert sorted(ps) == list(range(len(ps)))

    def test_global_mode_guard(self, docs):
        with pytest.raises(GlobalOrderTooLarge, match="shard_col"):
            seeded_shuffle(docs, max_rows=10)
        # under the limit the global order is a permutation
        out = seeded_shuffle(docs, max_rows=1000)
        assert sorted(r.position for r in out.collect()) == list(range(60))


class TestPackSequences:
    def test_intervals_tile_the_token_stream(self, spark):
        rows = [(i, 30 + i * 7 % 50) for i in range(40)]
        d = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_sequences(d, max_tokens=100, max_rows=1000).collect()
        total = sum(r[1] for r in rows)
        # pack slices cover every token exactly once
        assert sum(r.pack_tok_end - r.pack_tok_start for r in out) == total
        by_pack = {}
        for r in out:
            by_pack.setdefault(r.pack_id, []).append(r)
        for pid, rs in by_pack.items():
            lo, hi = pid * 100, min((pid + 1) * 100, total)
            ivs = sorted((r.pack_tok_start, r.pack_tok_end) for r in rs)
            assert ivs[0][0] == lo and ivs[-1][1] == hi
            for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
                assert b1 == a2  # contiguous, no overlap

    def test_straddling_doc_appears_in_both_packs(self, spark):
        d = spark.createDataFrame([(1, 60), (2, 60), (3, 60)],
                                  "doc_id long, n_tokens long")
        out = pack_sequences(d, max_tokens=100, max_rows=10)
        mid = [r for r in out.collect()
               if r.tok_start < 100 < r.tok_end]
        assert len(mid) == 2  # the straddler emits a row per pack
        assert {r.pack_id for r in mid} == {0, 1}

    def test_sharded_mode_is_shard_local(self, spark):
        rows = [(i, "a" if i % 2 else "b", 50) for i in range(20)]
        d = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
        out = pack_sequences(d, max_tokens=100, shard_col="lang").collect()
        for lang in ("a", "b"):
            packs = {r.pack_id for r in out if r.lang == lang}
            assert packs == set(range(5))  # 10 docs x 50 tok / 100 per pack

    def test_global_mode_guard(self, spark):
        d = spark.createDataFrame([(i, 1) for i in range(50)],
                                  "doc_id long, n_tokens long")
        with pytest.raises(GlobalOrderTooLarge):
            pack_sequences(d, max_tokens=10, max_rows=10)


def test_vocab_counts(spark):
    from swarm_spark.operators.textstats import corpus_vocabulary

    d = spark.createDataFrame(
        [(1, "a b a"), (2, "a  c"), (3, "B b")],
        "doc_id long, text string")
    out = {r.token: (r["count"], r.doc_freq)
           for r in corpus_vocabulary(d).collect()}
    assert out["a"] == (3, 2)
    assert out["b"] == (3, 2)  # lowercased; double space yields no '' token
    assert out["c"] == (1, 1)


class TestMixtureResample:
    W = {"en": 2.5, "de": 0.25}

    def test_exact_copies_vs_python(self, spark, docs):
        out = mixture_resample(docs, self.W, group_col="lang", seed=9)
        got = {}
        for r in out.collect():
            got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        import hashlib

        for i in range(60):
            lang = "en" if i % 3 else "de"
            w = self.W[lang]
            u52 = int(hashlib.md5(f"9:{i}".encode()).hexdigest()[:13], 16)
            want = int(w) + (1 if u52 < round((w - int(w)) * (1 << 52)) else 0)
            assert got.get(i, 0) == want, f"doc {i}"

    def test_copy_idx_dense_from_zero(self, spark, docs):
        out = mixture_resample(docs, self.W, group_col="lang", seed=9)
        per_doc = (
            out.groupBy("doc_id")
            .agg(F.count("*").alias("n"), F.min("copy_idx").alias("lo"),
                 F.max("copy_idx").alias("hi"))
            .collect()
        )
        assert all(r["lo"] == 0 and r["hi"] == r["n"] - 1 for r in per_doc)

    def test_partitioning_invariant(self, spark, docs):
        a = mixture_resample(docs, self.W, group_col="lang", seed=9)
        b = mixture_resample(docs.repartition(13, "lang"), self.W,
                             group_col="lang", seed=9)
        assert sorted(map(tuple, a.select("doc_id", "copy_idx").collect())) == \
            sorted(map(tuple, b.select("doc_id", "copy_idx").collect()))

    def test_zero_weight_drops_and_default_keeps(self, spark, docs):
        out = mixture_resample(docs, {"de": 0.0}, group_col="lang",
                               seed=9, default_weight=1.0)
        langs = {r["lang"] for r in out.select("lang").distinct().collect()}
        assert langs == {"en"}  # de dropped; en kept once by default
        assert out.count() == 40

    def test_negative_weight_raises(self, spark, docs):
        with pytest.raises(ValueError):
            mixture_resample(docs, {"en": -1.0}, group_col="lang")

    def test_no_shuffle_in_plan(self, spark, docs):
        plan = mixture_resample(docs, self.W, group_col="lang") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackTurns:
    def test_turns_never_split_and_windows_tile(self, spark):
        from swarm_spark.operators.sampling import pack_turns

        rows = [("c1", i, "w " * (9 + i)) for i in range(6)] + \
               [("c2", 0, "one two"), ("c2", 1, "x " * 100)]
        t = spark.createDataFrame([(c, i, s.strip()) for c, i, s in rows],
                                  "conv_id string, turn_idx int, text string")
        out = pack_turns(t, max_tokens=20).collect()
        by = {(r.conv_id, r.turn_idx): r for r in out}
        # offsets tile exactly: each turn starts where the previous ended
        for conv in ("c1", "c2"):
            turns = sorted([r for r in out if r.conv_id == conv],
                           key=lambda r: r.turn_idx)
            pos = 0
            for r in turns:
                assert r.tok_start == pos and r.tok_end == pos + r.n_tokens
                pos = r.tok_end
                # assignment = window containing the turn's START offset
                assert r.window_idx == r.tok_start // 20
        # a turn longer than the budget is its own over-budget window
        big = by[("c2", 1)]
        assert big.n_tokens == 100 and big.window_idx == big.tok_start // 20
        # window monotonicity within a conversation
        c1 = [by[("c1", i)].window_idx for i in range(6)]
        assert c1 == sorted(c1)

    def test_one_shuffle_no_global_sort(self, spark):
        """The plan must contain exactly one Exchange (conv_id hash) —
        no global sort, no guard needed at any size."""
        from swarm_spark.operators.sampling import pack_turns

        t = spark.createDataFrame([("c", 0, "a b")],
                                  "conv_id string, turn_idx int, text string")
        plan = pack_turns(t, 16)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "rangepartitioning" not in plan.lower()

    def test_max_tokens_validated(self, spark):
        import pytest as _pt

        from swarm_spark.operators.sampling import pack_turns

        t = spark.createDataFrame([("c", 0, "a")],
                                  "conv_id string, turn_idx int, text string")
        with _pt.raises(ValueError, match="positive"):
            pack_turns(t, 0)
