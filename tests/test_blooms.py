"""Per-file equality bloom filters (swarm_spark.blooms) + their
integration into file skipping (filestats.prune_files) and the table
API (IcepackTable.build_blooms, read(prune=...)).

The contract under test is the file-skipping contract extended to
blooms: for every predicate shape, read(prune=P) must equal
read().filter(P) — a bloom may only ever skip a file the value was
provably never written to. The headline property: on an UNCLUSTERED
high-cardinality key (every dir's [min,max] spans the key space, so
stats prune nothing) a point read with blooms scans ~1 file.
"""

import base64

import pyspark.sql.functions as F
import pytest

from swarm_spark import blooms, filestats
from swarm_spark.tablestore import IcepackCatalog


def _interleaved_table(spark, tmp_path, n=4000, dirs=4):
    """IDs striped across dirs (id % dirs) — min/max of every dir
    spans [0, n), the worst case for range stats, the case blooms
    exist for."""
    t = IcepackCatalog(str(tmp_path)).table("t")
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("sid"),
        (F.col("id") % 97).alias("v"),
    )
    for i in range(dirs):
        t.append(df.filter(F.col("id") % dirs == i))
    return t


class TestPrimitives:
    def test_canonical_matches_spark_cast(self):
        assert blooms.canonical(5) == b"5"
        assert blooms.canonical(-17) == b"-17"
        assert blooms.canonical("abc") == b"abc"
        # un-canonicalizable literals: caller must not prune
        assert blooms.canonical(5.0) is None
        assert blooms.canonical(True) is None
        assert blooms.canonical(None) is None

    def test_membership_never_false_negative(self):
        m_bits, k = 1024, 6
        import numpy as np

        arr = np.zeros(m_bits // 8, dtype=np.uint8)
        vals = [str(i).encode() for i in range(50)]
        for v in vals:
            for pos in blooms.positions(v, m_bits, k):
                arr[pos >> 3] |= 1 << (pos & 7)
        packed = arr.tobytes()
        for v in vals:
            assert blooms.maybe_contains(packed, m_bits, k, v)


class TestTableBlooms:
    def test_point_read_skips_unclustered_files(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path)
        # the striped layout defeats DIR-level range stats: every dir
        # keeps at least one file (its contiguous chunk covering the
        # id), so a point read still scans one file per dir
        rep = t.prune_report([("id", "=", 1234)])
        assert rep["files_kept"] >= 4
        out = t.build_blooms(spark, ["id", "sid"])
        assert out["dirs_built"] == 4
        rep2 = t.prune_report([("id", "=", 1234)])
        # id 1234 was only ever written to ONE dir (1234 % 4): blooms
        # prove its absence from the other dirs' stat-surviving files
        assert rep2["files_kept"] <= 1 + rep["files_kept"] // 4
        got = t.read(spark, prune=[("id", "=", 1234)]).collect()
        assert [r.id for r in got] == [1234]

    def test_prune_equals_filter_for_equality_matrix(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=2000)
        t.build_blooms(spark, ["id", "sid"])
        full = t.read(spark)
        cases = [
            [("id", "=", 7)],
            [("id", "=", 999_999)],            # absent value
            [("id", "in", [3, 1999, 777_777])],
            [("sid", "=", "doc-42")],
            [("sid", "=", "nope")],
            [("sid", "in", ["doc-1", "doc-2", "doc-xyz"])],
            [("id", "=", 7), ("sid", "=", "doc-7")],
            [("id", "=", 7), ("sid", "=", "doc-8")],  # conjunct mismatch
        ]
        for preds in cases:
            expect = sorted(
                r.id for r in full.filter(
                    filestats.predicate_column(preds)).collect())
            got = sorted(
                r.id for r in t.read(spark, prune=preds).collect())
            assert got == expect, preds

    def test_range_ops_ignore_blooms(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=1000)
        t.build_blooms(spark, ["id"])
        got = sorted(r.id for r in
                     t.read(spark, prune=[("id", "<", 10)]).collect())
        assert got == list(range(10))

    def test_uncanonicalizable_literal_never_prunes(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=100)
        t.build_blooms(spark, ["id"])
        # float literal on an int column: bloom must be bypassed;
        # result must still equal the engine filter (7.0 == 7)
        got = sorted(r.id for r in
                     t.read(spark, prune=[("id", "=", 7.0)]).collect())
        assert got == [7]

    def test_new_dirs_without_blooms_still_scan(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=100)
        t.build_blooms(spark, ["id"])
        t.append(spark.range(100, 110).select(
            F.col("id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("sid"),
            (F.col("id") % 97).alias("v")))
        got = t.read(spark, prune=[("id", "=", 105)]).collect()
        assert [r.id for r in got] == [105]

    def test_build_is_idempotent_and_reported(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=100)
        first = t.build_blooms(spark, ["id"])
        again = t.build_blooms(spark, ["id"])
        assert first["dirs_built"] == 4
        assert again["dirs_already"] == 4 and again["dirs_built"] == 0

    def test_nulls_and_absent_columns(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(1, "a"), (2, None), (None, "c")], "id bigint, s string"))
        t.build_blooms(spark, ["id", "s", "missing_col"])
        # null rows are never added; equality never matches null —
        # prune+filter agree
        assert [r.s for r in t.read(spark, prune=[("id", "=", 2)]).collect()] \
            == [None]
        assert t.read(spark, prune=[("id", "=", 999)]).count() == 0

    def test_sidecar_shape_and_corruption_tolerance(self, spark, tmp_path):
        import os

        t = _interleaved_table(spark, tmp_path, n=100)
        t.build_blooms(spark, ["id"])
        d = t.current_snapshot()["data_dirs"][0]
        side = blooms.load_dir_blooms(d)
        assert side["m_bits"] % 8 == 0 and side["k"] >= 1
        for entry in side["files"].values():
            raw = base64.b64decode(entry["id"])
            assert len(raw) == side["m_bits"] // 8
        # corrupt sidecar → treated as absent, scan everything, same rows
        with open(os.path.join(d, blooms.BLOOM_NAME), "w") as fh:
            fh.write("{not json")
        got = t.read(spark, prune=[("id", "=", 17)]).collect()
        assert [r.id for r in got] == [17]


class TestPropertyNoFalseNegatives:
    """Hypothesis: for ANY value set and ANY probe drawn from it, a
    bloom built from the set always says maybe — the soundness half of
    the contract (the other half, false positives, only costs I/O)."""

    def test_random_int_sets(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        import numpy as np

        @settings(max_examples=200, deadline=None)
        @given(st.sets(st.integers(-2**62, 2**62), min_size=1, max_size=200),
               st.sampled_from([256, 1024, 8192]),
               st.integers(1, 8))
        def prop(vals, m_bits, k):
            arr = np.zeros(m_bits // 8, dtype=np.uint8)
            for v in vals:
                for pos in blooms.positions(blooms.canonical(v), m_bits, k):
                    arr[pos >> 3] |= 1 << (pos & 7)
            packed = arr.tobytes()
            for v in vals:
                assert blooms.maybe_contains(
                    packed, m_bits, k, blooms.canonical(v))

        prop()

    def test_random_str_sets(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        import numpy as np

        @settings(max_examples=100, deadline=None)
        @given(st.sets(st.text(min_size=0, max_size=40), min_size=1,
                       max_size=100))
        def prop(vals):
            m_bits, k = 2048, 6
            arr = np.zeros(m_bits // 8, dtype=np.uint8)
            for v in vals:
                for pos in blooms.positions(blooms.canonical(v), m_bits, k):
                    arr[pos >> 3] |= 1 << (pos & 7)
            packed = arr.tobytes()
            for v in vals:
                assert blooms.maybe_contains(
                    packed, m_bits, k, blooms.canonical(v))

        prop()


class TestCompactBloomRefresh:
    def test_compact_rebuilds_blooms_before_commit(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=400)
        t.build_blooms(spark, ["id"])
        t.compact(spark, bloom_cols=["id"])
        d = t.current_snapshot()["data_dirs"]
        assert len(d) == 1
        assert blooms.load_dir_blooms(d[0]) is not None  # fresh blooms
        got = t.read(spark, prune=[("id", "=", 123)]).collect()
        assert [r.id for r in got] == [123]

    def test_compact_without_bloom_cols_drops_blooms_soundly(self, spark, tmp_path):
        t = _interleaved_table(spark, tmp_path, n=200)
        t.build_blooms(spark, ["id"])
        t.compact(spark)
        d = t.current_snapshot()["data_dirs"]
        assert blooms.load_dir_blooms(d[0]) is None  # no stale carry
        got = t.read(spark, prune=[("id", "=", 77)]).collect()
        assert [r.id for r in got] == [77]


class TestCrossTypeLiterals:
    def test_int_literal_on_string_column_never_bloom_pruned(self, spark, tmp_path):
        """Engine equality CASTS: '007' = 7 matches in Spark, but the
        bloom hashed the text '007' while canonical(7) is '7'. The
        stats-tag gate must bypass the bloom so the row survives."""
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [("007", 1), ("042", 2)], "s string, id bigint").coalesce(1))
        t.build_blooms(spark, ["s"])
        got = t.read(spark, prune=[("s", "=", 7)]).collect()
        want = t.read(spark).filter(F.col("s") == 7).collect()
        assert [r.id for r in got] == [r.id for r in want] == [1]

    def test_string_literal_on_int_column_never_bloom_pruned(self, spark, tmp_path):
        t = IcepackCatalog(str(tmp_path)).table("t")
        t.append(spark.createDataFrame(
            [(7, "a"), (42, "b")], "id bigint, s string").coalesce(1))
        t.build_blooms(spark, ["id"])
        got = sorted(r.s for r in
                     t.read(spark, prune=[("id", "=", "7")]).collect())
        want = sorted(r.s for r in
                      t.read(spark).filter(F.col("id") == "7").collect())
        assert got == want == ["a"]
