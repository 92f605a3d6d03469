"""Training-data operators: dedup, similarity, textstats, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


class TestExactDedup:
    def test_dedup_exact(self, spark, docs):
        from swarm_spark.operators.dedup import dedup_exact

        dup = docs.union(docs.limit(50))  # inject 50 exact dups
        out = dedup_exact(dup)
        assert out.count() == docs.select(
            F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        ).distinct().count()

    def test_whitespace_case_insensitive(self, spark):
        from swarm_spark.operators.dedup import dedup_exact

        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "different")],
            "doc_id bigint, text string",
        )
        out = dedup_exact(df)
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]


class TestMinhash:
    def test_near_dups_found(self, spark):
        from swarm_spark.operators.dedup import dedup_minhash, minhash_lsh_pairs

        base = ("the quick brown fox jumps over the lazy dog and then runs "
                "far away into the deep dark forest to hide from hunters")
        near = base.replace("dark", "damp")  # 1-word change
        far = "completely unrelated content about quantum physics experiments"
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id bigint, text string"
        )
        pairs = minhash_lsh_pairs(df, num_hashes=64, bands=16).collect()
        found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
        assert (1, 2) in found and found[(1, 2)] > 0.6
        assert (1, 3) not in found

        out = dedup_minhash(df, threshold=0.6, num_hashes=64, bands=16)
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]

    def test_jaccard_exact_value(self, spark):
        from swarm_spark.operators.dedup import shingles

        df = spark.createDataFrame([("a b c d",)], "text string")
        (r,) = df.select(shingles("text", 3).alias("s")).collect()
        assert sorted(r.s) == ["a b c", "b c d"]

    def test_short_doc_single_shingle(self, spark):
        from swarm_spark.operators.dedup import shingles

        df = spark.createDataFrame([("hi there",)], "text string")
        (r,) = df.select(shingles("text", 3).alias("s")).collect()
        assert r.s == ["hi there"]


class TestSimhash:
    def test_near_dups(self, spark):
        from swarm_spark.operators.dedup import simhash_pairs

        base = " ".join(f"word{i}" for i in range(60))
        near = base.replace("word7 ", "word7x ")
        far = " ".join(f"other{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id bigint, text string"
        )
        got = {(r.id_a, r.id_b) for r in simhash_pairs(df, max_hamming=6).collect()}
        assert (1, 2) in got and (1, 3) not in got

    def test_identical_hamming_zero(self, spark):
        from swarm_spark.operators.dedup import simhash_pairs

        df = spark.createDataFrame(
            [(1, "same text here"), (2, "same text here")],
            "doc_id bigint, text string",
        )
        (p,) = simhash_pairs(df).collect()
        assert p.hamming == 0


class TestNgramJaccard:
    def test_blocked_pairs(self, spark):
        from swarm_spark.operators.dedup import ngram_jaccard_pairs

        a = "alpha beta gamma delta epsilon zeta eta theta"
        b = "alpha beta gamma delta epsilon zeta eta iota"
        df = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
        pairs = ngram_jaccard_pairs(df, threshold=0.3).collect()
        assert len(pairs) == 1 and pairs[0].jaccard > 0.4


class TestEmbeddingOps:
    def test_cosine_topk_matches_numpy(self, spark, embs):
        from swarm_spark.operators.similarity import cosine_topk

        pdf = embs.toPandas()
        q = list(pdf.iloc[0].embedding)
        got = cosine_topk(embs, q, k=5).toPandas()

        m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
        qv = np.array(q)
        cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
        order = sorted(zip(-cos, pdf.vec_id))[:5]
        exp_ids = [int(v) for _, v in order]
        assert got.vec_id.tolist() == exp_ids
        assert got.cos.iloc[0] == pytest.approx(1.0, abs=1e-6)

    def test_ann_lsh_recall(self, spark, embs):
        from swarm_spark.operators.similarity import ann_lsh_topk, cosine_topk

        pdf = embs.limit(1).toPandas()
        q = list(pdf.iloc[0].embedding)
        exact = {r.vec_id for r in cosine_topk(embs, q, k=10).collect()}
        approx = {r.vec_id for r in ann_lsh_topk(embs, q, k=10, n_planes=8,
                                                 max_hamming=4).collect()}
        # the self vector always survives (hamming 0) and on these
        # near-random test embeddings hyperplane LSH recall is modest —
        # assert the prefilter keeps a meaningful share of true top-10
        assert len(exact & approx) >= 3

    def test_ivf(self, spark, embs):
        from swarm_spark.operators.similarity import (
            cosine_topk, ivf_assign, ivf_centroids, ivf_topk,
        )

        cents = ivf_centroids(embs, 8)
        assigned = ivf_assign(embs, cents).cache()
        # every vector lands in exactly one list
        assert assigned.count() == embs.count()
        assert assigned.select("_list").distinct().count() <= 8

        q = list(embs.limit(1).toPandas().iloc[0].embedding)
        exact = {r.vec_id for r in cosine_topk(embs, q, k=5).collect()}
        got = {r.vec_id for r in ivf_topk(assigned, cents, q, k=5, n_probe=4).collect()}
        assert len(exact & got) >= 3

    def test_embedding_dup_pairs_finds_self_dups(self, spark, embs):
        from swarm_spark.operators.dedup import embedding_dup_pairs

        # duplicate 10 vectors under new ids → must be found at cos≈1
        dup = embs.limit(10).withColumn("vec_id", F.col("vec_id") + 100000)
        both = embs.union(dup)
        import pytest as _pt
        with _pt.raises(ValueError, match="dim is required"):
            embedding_dup_pairs(both, threshold=0.999)  # no plan-time probe
        pairs = embedding_dup_pairs(both, threshold=0.999, dim=64).collect()
        found = {(r.id_a, r.id_b) for r in pairs}
        assert all((i, i + 100000) in found for i in range(10))


class TestTextstats:
    def test_token_counts(self, spark):
        from swarm_spark.operators.textstats import token_count_bpe, token_count_ws

        df = spark.createDataFrame([("Hello, world! 42 tests",)], "text string")
        (r,) = df.select(
            token_count_ws("text").alias("ws"), token_count_bpe("text").alias("bpe")
        ).collect()
        assert r.ws == 4
        # hello , world ! 42 tests → 6
        assert r.bpe == 6

    def test_langid(self, spark):
        from swarm_spark.operators.textstats import langid

        df = spark.createDataFrame(
            [("the cat and the dog in the house",),
             ("der hund und die katze ist nicht hier",),
             ("le chat et les chiens dans la maison",),
             ("xyzzy plugh qwerty",)],
            "text string",
        )
        got = [r[0] for r in df.select(langid("text")).collect()]
        assert got == ["en", "de", "fr", "und"]

    def test_quality_ordering(self, spark):
        from swarm_spark.operators.textstats import quality_score

        good = "the quick brown fox jumps over the lazy dog and it was great for all of us"
        bad = "1 2 3 4 5 6 7 8 9 !!!! ???? 0000000"
        df = spark.createDataFrame([(1, good), (2, bad)], "i int, text string")
        got = {r.i: r.q for r in df.select("i", quality_score("text").alias("q")).collect()}
        assert got[1] > got[2]
        assert 0.0 <= got[2] <= got[1] <= 1.0

    def test_fingerprint_order_insensitive(self, spark):
        from swarm_spark.operators.textstats import fingerprint

        df = spark.createDataFrame(
            [("alpha beta gamma",), ("gamma alpha beta",), ("alpha beta delta",)],
            "text string",
        )
        fps = [r[0] for r in df.select(fingerprint("text")).collect()]
        assert fps[0] == fps[1] != fps[2]


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from swarm_spark.operators.multimodal import extract_features, synthetic_media

        media = synthetic_media(spark, n=30)
        feats = extract_features(media).cache()
        pdf = feats.toPandas()
        # videos fan out to 3 frames; images/audio to 1
        n_video = 10
        assert len(pdf) == 30 + 2 * n_video
        assert set(pdf.kind) == {"image", "audio", "video"}
        assert all(len(f) == 16 for f in pdf.feature)
        # deterministic: same input → same features
        pdf2 = extract_features(media).toPandas()
        k = ["media_id", "frame_idx"]
        a = pdf.sort_values(k).reset_index(drop=True)
        b = pdf2.sort_values(k).reset_index(drop=True)
        assert a.sha256.tolist() == b.sha256.tolist()
        assert a.feature.map(tuple).tolist() == b.feature.map(tuple).tolist()

    def test_real_decoder_gated_for_codec_formats(self, spark):
        """r4: decoder='real' decodes png/wav via the stdlib codecs
        (tests/test_media_codecs.py); formats that need codec
        libraries still raise — inside the kernel, at evaluation."""
        from swarm_spark.operators.multimodal import extract_features, synthetic_media

        # synthetic_media payloads are raw hash bytes (no magic) →
        # the capability boundary fires when the plan runs
        out = extract_features(synthetic_media(spark, 3), decoder="real")
        with pytest.raises(Exception, match="codec library"):
            out.collect()


class TestQuantizedScoring:
    """Cross-engine-exact integer scoring (the oracle-verified path)."""

    def test_quantized_topk_matches_float_topk_ids(self, spark, embs):
        from swarm_spark.operators.similarity import cosine_topk, cosine_topk_quantized

        q = [r[0] for r in embs.filter(F.col("vec_id") == 0)
             .select(F.explode("embedding")).collect()]
        float_ids = [r.vec_id for r in cosine_topk(embs, q, k=10).collect()]
        quant_ids = [r.vec_id for r in
                     cosine_topk_quantized(embs, query_id=0, k=10).collect()]
        # quantization at scale=128 must not reorder well-separated
        # neighbors on this corpus
        assert set(float_ids) == set(quant_ids)

    def test_ivf_quantized_probe_all_is_exact(self, spark, embs):
        from swarm_spark.operators.similarity import (
            cosine_topk_quantized,
            ivf_assign,
            ivf_centroids,
            ivf_topk_quantized,
        )

        cents = ivf_centroids(embs, 8)
        assigned = ivf_assign(embs, cents)
        q = [r[0] for r in embs.filter(F.col("vec_id") == 1)
             .select(F.explode("embedding")).collect()]
        ivf = ivf_topk_quantized(assigned, cents, q, k=10, n_probe=8).collect()
        brute = cosine_topk_quantized(embs, query_id=1, k=10).collect()
        assert [(r.vec_id, r.score_q) for r in ivf] == \
               [(r.vec_id, r.score_q) for r in brute]

    def test_simhash_md5_basis_matches_xxhash_structure(self, spark):
        from swarm_spark.operators.dedup import simhash_pairs

        rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(3)]
        rows += [(10, "completely different text about spark shuffles and joins")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for hf in ("xxhash64", "md5w60"):
            got = simhash_pairs(df, max_hamming=3, hash_fn=hf).collect()
            pairs = {(r.id_a, r.id_b) for r in got}
            assert pairs == {(0, 1), (0, 2), (1, 2)}
            assert all(r.hamming == 0 for r in got)


class TestHotShingleGuard:
    def test_auto_guard_bounds_candidates(self, spark):
        """A stop-shingle shared by EVERY doc must not O(n^2) the pair
        count once the corpus crosses the guard threshold."""
        from swarm_spark.operators.dedup import jaccard_pairs_inverted

        n = 400
        # every doc: unique body + one white-hot shared shingle
        rows = [(i, f"hot stop shingle unique{i} body{i} tail{i} word{i} more{i}")
                for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # guard ON (threshold lowered so this corpus qualifies)
        guarded = jaccard_pairs_inverted(
            df, threshold=0.01, max_doc_ratio="auto", guard_min_docs=100
        )
        # every pair shares ONLY the hot shingles -> guard drops them
        # from candidate generation -> no O(n^2) blowup
        assert guarded.count() == 0
        # guard OFF: the exhaustive path materializes all ~n^2/2 pairs
        unguarded = jaccard_pairs_inverted(
            df.limit(50), threshold=0.01, max_doc_ratio=None
        )
        assert unguarded.count() == 50 * 49 // 2

    def test_guard_preserves_exact_scores_for_real_dups(self, spark):
        from swarm_spark.operators.dedup import jaccard_pairs_inverted

        rows = [(i, f"common prefix words here doc{i} alpha beta gamma") for i in range(30)]
        rows += [(100, "spark shuffle partition skew salt broadcast join spark"),
                 (101, "spark shuffle partition skew salt broadcast join spark")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = jaccard_pairs_inverted(
            df, threshold=0.9, max_doc_ratio=0.5, guard_min_docs=1
        ).collect()
        assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(100, 101, 1.0)]


class TestMultimodalKernel:
    def test_callable_kernel_injected(self, spark):
        from swarm_spark.operators.multimodal import extract_features, synthetic_media

        def kernel(payload: bytes, dim: int) -> np.ndarray:
            return np.full(dim, float(len(payload) % 7), dtype=np.float32)

        media = synthetic_media(spark, n=6)
        pdf = extract_features(media, decoder=kernel, feature_dim=4).toPandas()
        assert all(len(f) == 4 for f in pdf.feature)
        for _, r in pdf.iterrows():
            assert all(v == float((r.n_bytes + 4) % 7) for v in r.feature)

    def test_media_from_documents_deterministic(self, spark, docs):
        from swarm_spark.operators.multimodal import extract_features, media_from_documents

        media = media_from_documents(docs, limit_ids=30)
        pdf = extract_features(media).toPandas()
        import hashlib
        texts = {str(r.doc_id): r.text for r in
                 docs.filter(F.col("doc_id") < 30).collect()}
        for _, r in pdf.iterrows():
            raw = texts[r.media_id].encode()
            assert r.n_bytes == len(raw)
            assert r.sha256 == hashlib.sha256(raw).hexdigest()


class TestSimhashHotBucketGuard:
    def test_dominant_token_bucket_bounded(self, spark):
        """A dominant repeated token collapses signatures (simhash is
        a vote over tokens WITH repeats) → one bucket holds everything
        → O(n²) candidates. The guard bounds it."""
        from swarm_spark.operators.dedup import simhash_pairs

        # 200 docs: unique half + a dominant token repeated 30×
        rows = [(i, ("hot " * 30) + f"unique{i} alpha{i} beta{i} gamma{i}")
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        unguarded = simhash_pairs(df, max_hamming=3, max_bucket_ratio=None)
        guarded = simhash_pairs(df, max_hamming=3,
                                max_bucket_ratio=0.05, guard_min_docs=1)
        n_un, n_g = unguarded.count(), guarded.count()
        assert n_un > 1000       # the blowup is real
        assert n_g < n_un / 10   # and the guard kills it

    def test_guard_keeps_real_dups(self, spark):
        from swarm_spark.operators.dedup import simhash_pairs

        rows = [(i, f"totally distinct document number {i} with words "
                    f"{i*7} {i*13} {i*29} {i*31} {i*37}") for i in range(50)]
        rows += [(100, "the same exact duplicate text here okay"),
                 (101, "the same exact duplicate text here okay")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = simhash_pairs(df, max_hamming=3,
                            max_bucket_ratio=0.2, guard_min_docs=1).collect()
        assert (100, 101, 0) in {(r.id_a, r.id_b, r.hamming) for r in got}


class TestIvfPartitionPruning:
    def test_probe_prunes_partitions_on_disk(self, spark, embs, tmp_path):
        """The IVF scale path: the assigned table written partitioned
        by _list makes the probe a PARTITION FILTER — only
        n_probe/n_lists of the corpus is scanned."""
        from swarm_spark.operators.similarity import (
            ivf_assign,
            ivf_centroids,
            ivf_topk,
        )
        from swarm_spark.plans.skew import physical_plan

        cents = ivf_centroids(embs, 8)
        assigned = ivf_assign(embs, cents)
        path = str(tmp_path / "ivf")
        assigned.write.partitionBy("_list").parquet(path)

        on_disk = spark.read.parquet(path)
        q = [r[0] for r in embs.filter("vec_id = 0")
             .select(F.explode("embedding")).collect()]
        topk = ivf_topk(on_disk, cents, q, k=10, n_probe=2)
        plan = physical_plan(topk)
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and any("_list" in ln for ln in pf), plan[:1500]
        # and the probe actually restricts the scan input
        assert topk.count() == 10


class TestRepetitionPiiDecontamination:
    """Round-3 training-pipeline additions: repetition filter, PII
    scrub, benchmark decontamination."""

    def test_repetition_ratio(self, spark):
        from swarm_spark.operators.textstats import repetition_ratio

        df = spark.createDataFrame(
            [("a", "x y z x y z x y z"),   # 7 shingles, 3 distinct
             ("b", "a b c d e f"),          # no repeats
             ("c", "hi")],                  # short doc -> 1 shingle
            "doc_id string, text string",
        )
        got = {r.doc_id: r.rep for r in df.select(
            "doc_id", repetition_ratio("text").alias("rep")).collect()}
        assert got["a"] == round((7 - 3) / 7, 4)
        assert got["b"] == 0.0
        assert got["c"] == 0.0

    def test_redact_pii(self, spark):
        from swarm_spark.operators.textstats import pii_counts, redact_pii

        df = spark.createDataFrame(
            [("mail bob@corp.example.org from 192.168.0.1 call +15551234567 ok",)],
            "text string",
        )
        counts = pii_counts(F.col("text"))
        row = df.select(
            redact_pii("text").alias("red"),
            counts["email"].alias("e"), counts["ipv4"].alias("i"),
            counts["phone"].alias("p"),
        ).collect()[0]
        assert row.red == "mail <EMAIL> from <IP> call <PHONE> ok"
        assert (row.e, row.i, row.p) == (1, 1, 1)

    def test_redact_pii_clean_text_untouched(self, spark):
        from swarm_spark.operators.textstats import redact_pii

        df = spark.createDataFrame([("just words here",)], "text string")
        assert df.select(redact_pii("text").alias("r")).collect()[0].r == \
            "just words here"

    def test_flag_contaminated(self, spark):
        from swarm_spark.operators.dedup import flag_contaminated

        bench = spark.createDataFrame(
            [("q1", "the quick brown fox jumps over the lazy dog today")],
            "doc_id string, text string",
        )
        docs = spark.createDataFrame(
            [("d1", "intro text the quick brown fox jumps over the lazy dog today end"),
             ("d2", "completely different words with no benchmark overlap at all"),
             ("d3", "quick brown fox alone")],  # <8-gram overlap only
            "doc_id string, text string",
        )
        got = {r.doc_id: r.contaminated
               for r in flag_contaminated(docs, bench, k=8).collect()}
        assert got == {"d1": True, "d2": False, "d3": False}

    def test_flag_contaminated_is_broadcast(self, spark):
        """The corpus side must not shuffle: the semi-join against the
        benchmark shingles plans as a BroadcastHashJoin."""
        from swarm_spark.operators.dedup import flag_contaminated

        bench = spark.createDataFrame([("q", "a b c d e f g h")],
                                      "doc_id string, text string")
        docs = spark.createDataFrame([("d", "a b c d e f g h i")],
                                     "doc_id string, text string")
        plan = flag_contaminated(docs, bench, k=8)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_extract_domains_and_blocklist(self, spark):
        from swarm_spark.operators.textstats import (
            extract_domains,
            flag_blocked_domains,
        )

        docs = spark.createDataFrame(
            [("d1", "read http://Bad.Example.com/x and https://ok.org/y"),
             ("d2", "no urls at all"),
             ("d3", "https://also-fine.net")],
            "doc_id string, text string",
        )
        doms = {r.doc_id: r.d for r in docs.select(
            "doc_id", extract_domains("text").alias("d")).collect()}
        assert doms["d1"] == ["bad.example.com", "ok.org"]
        assert doms["d2"] == []

        block = spark.createDataFrame([("bad.example.com",)], "domain string")
        got = {r.doc_id: r.blocked
               for r in flag_blocked_domains(docs, block).collect()}
        assert got == {"d1": True, "d2": False, "d3": False}

    def test_domain_filter_is_broadcast(self, spark):
        from swarm_spark.operators.textstats import flag_blocked_domains

        docs = spark.createDataFrame([("d", "https://a.com/z")],
                                     "doc_id string, text string")
        block = spark.createDataFrame([("a.com",)], "domain string")
        plan = flag_blocked_domains(docs, block)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestBoilerplateTurns:
    def _turns(self, spark):
        rows = []
        for c in range(6):
            rows.append((f"c{c}", 0, "system", "you are helpful"))  # 6 convs
            rows.append((f"c{c}", 1, "user", f"unique question {c}"))
        rows.append(("c0", 2, "user", "you are helpful"))  # repeat INSIDE one conv
        rows.append(("c0", 3, "user", "thanks"))           # 1 conv only
        rows.append(("c1", 3, "user", "thanks"))           # 2 convs
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")

    def test_threshold_on_distinct_convs(self, spark):
        from swarm_spark.operators.dedup import flag_boilerplate_turns

        out = flag_boilerplate_turns(self._turns(spark), min_convs=6)
        got = {(r["conv_id"], r["turn_idx"]): (r["is_boilerplate"], r["bp_convs"])
               for r in out.collect()}
        # "you are helpful" occurs in 6 distinct convs (7 rows: the c0
        # repeat does not add a conv) -> flagged everywhere it appears
        assert got[("c0", 0)] == (True, 6)
        assert got[("c0", 2)] == (True, 6)
        assert got[("c5", 0)] == (True, 6)
        # "thanks" spans only 2 convs -> below min_convs=6
        assert got[("c0", 3)] == (False, 0)
        assert got[("c0", 1)] == (False, 0)

    def test_min_convs_floor_of_two(self, spark):
        from swarm_spark.operators.dedup import flag_boilerplate_turns

        # min_convs=1 would flag EVERY turn; the operator floors at 2
        out = flag_boilerplate_turns(self._turns(spark), min_convs=1)
        got = {(r["conv_id"], r["turn_idx"]): r["is_boilerplate"] for r in out.collect()}
        assert got[("c0", 1)] is False      # unique text never flagged
        assert got[("c0", 3)] is True       # 2 convs >= floor

    def test_remove_drops_only_boilerplate(self, spark):
        from swarm_spark.operators.dedup import remove_boilerplate_turns

        out = remove_boilerplate_turns(self._turns(spark), min_convs=6)
        texts = [r["text"] for r in out.collect()]
        assert "you are helpful" not in texts
        assert len(texts) == 8  # 6 unique questions + 2 thanks
        assert "is_boilerplate" not in out.columns

    def test_join_back_is_broadcast(self, spark):
        from swarm_spark.operators.dedup import flag_boilerplate_turns

        plan = flag_boilerplate_turns(self._turns(spark), min_convs=2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestIncrementalDedup:
    def _corpus(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (1, base),                          # old
            (2, base + " extra"),               # old near-dup of 1
            (3, "totally different words here in this document friend"),  # old
            (10, base),                         # NEW: dup of old 1/2
            (11, "totally different words here in this document friend"),  # NEW: dup of old 3
            (12, "fresh unique content nothing like anything else at all"),  # NEW: unique
            (13, "fresh unique content nothing like anything else at most"),  # NEW: near-dup of 12
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        return docs.filter("doc_id >= 10"), docs.filter("doc_id < 10")

    def test_no_old_old_pairs_and_kinds(self, spark):
        from swarm_spark.operators.dedup import minhash_lsh_pairs_incremental

        new, old = self._corpus(spark)
        pairs = minhash_lsh_pairs_incremental(new, old, num_hashes=64, bands=32)
        rows = pairs.filter("jaccard >= 0.5").collect()
        kinds = {(r["id_a"], r["id_b"]): r["kind"] for r in rows}
        # old x old (1,2) must NOT appear even though they are near-dups
        assert all(not (a < 10 and b < 10) for a, b in kinds)
        assert kinds[(10, 1)] == "new_old"
        assert kinds[(10, 2)] == "new_old"
        assert kinds[(11, 3)] == "new_old"
        assert kinds[(12, 13)] == "new_new"

    def test_stored_index_equivalent(self, spark):
        from swarm_spark.operators.dedup import (
            minhash_band_index,
            minhash_lsh_pairs_incremental,
        )

        new, old = self._corpus(spark)
        idx = minhash_band_index(old, num_hashes=64, bands=32)
        direct = minhash_lsh_pairs_incremental(new, old, num_hashes=64, bands=32)
        via_idx = minhash_lsh_pairs_incremental(new, old, num_hashes=64,
                                                bands=32, old_index=idx)
        key = lambda df: sorted(  # noqa: E731
            (r["id_a"], r["id_b"], r["kind"], r["inter"], r["union_sz"])
            for r in df.collect())
        assert key(direct) == key(via_idx)

    def test_dedup_admits_only_novel(self, spark):
        from swarm_spark.operators.dedup import dedup_minhash_incremental

        new, old = self._corpus(spark)
        kept = sorted(r["doc_id"] for r in
                      dedup_minhash_incremental(new, old, threshold=0.5,
                                                num_hashes=64, bands=32).collect())
        # 10, 11 duplicate the old corpus; 13 loses to 12 within the increment
        assert kept == [12]
