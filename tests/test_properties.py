"""Property-based tests (hypothesis) for the pure semantic kernels:
nil-strip, canonical JSON, schema merge, backfill packing."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from swarm_spark.functions.normalize import canonical_json, strip_nils

# JSON-ish values: scalars, lists, dicts up to depth 3
json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**9, 10**9),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=5),
    ),
    max_leaves=20,
)


class TestStripNilsProperties:
    # NOTE: strip_nils is deliberately NOT idempotent — the reference
    # keeps a dict that became empty BY stripping but drops an
    # originally-empty dict (utils_test.go:11-85), so a second pass
    # drops what the first kept (hypothesis found {'':{'':None}}).
    # The faithful property is a differential check against an
    # independent reimplementation of clone's (value, ok) semantics
    # (utils.go:19-135):
    @given(json_values)
    @settings(max_examples=300, deadline=None)
    def test_matches_go_clone_model(self, v):
        def cl(x):
            if x is None:
                return None, False
            if isinstance(x, dict):
                if not x:
                    return x, False
                return {k: c for k, val in x.items() if val is not None
                        for c, ok in [cl(val)] if ok}, True
            if isinstance(x, list):
                arr = [c for e in x for c, ok in [cl(e)] if ok]
                return (arr, True) if arr else (x, False)
            return x, True

        c, ok = cl(v)
        expected = c if ok else v  # root passthrough (utils.go:14-17)
        assert strip_nils(v) == expected

    @given(json_values)
    @settings(max_examples=300, deadline=None)
    def test_no_nulls_in_dicts_after_strip(self, v):
        def has_null_value(x):
            if isinstance(x, dict):
                return any(val is None or has_null_value(val) for val in x.values())
            if isinstance(x, list):
                return any(val is None or has_null_value(val) for val in x)
            return False

        res = strip_nils(v)
        if res is v:
            return  # root passthrough: Go returns src unchanged when
            # the whole value strips away (utils.go:14-17)
        assert not has_null_value(res)

    @given(json_values)
    @settings(max_examples=300, deadline=None)
    def test_canonical_json_roundtrip_stable(self, v):
        stripped = strip_nils(v)
        c1 = canonical_json(stripped)
        c2 = canonical_json(json.loads(c1))
        assert c1 == c2  # serialize → parse → serialize is a fixpoint


ddl_field_names = st.sampled_from(list("abcdefgh"))
ddl_types = st.sampled_from(["string", "bigint", "double", "boolean"])


class TestMergeSchemasProperties:
    def _schema(self, fields):
        from pyspark.sql import types as T

        m = {"string": T.StringType(), "bigint": T.LongType(),
             "double": T.DoubleType(), "boolean": T.BooleanType()}
        return T.StructType([T.StructField(n, m[t]) for n, t in fields])

    @given(st.lists(st.tuples(ddl_field_names, ddl_types), max_size=6,
                    unique_by=lambda ft: ft[0]))
    @settings(max_examples=200, deadline=None)
    def test_self_merge_identity(self, fields):
        from swarm_spark.tablestore import merge_schemas

        s = self._schema(fields)
        assert merge_schemas(s, s) == s

    @given(
        st.lists(st.tuples(ddl_field_names, ddl_types), max_size=5,
                 unique_by=lambda ft: ft[0]),
        st.lists(st.tuples(ddl_field_names, ddl_types), max_size=5,
                 unique_by=lambda ft: ft[0]),
    )
    @settings(max_examples=200, deadline=None)
    def test_merge_union_and_order(self, a, b):
        from swarm_spark.tablestore import SchemaConflictError, merge_schemas

        sa, sb = self._schema(a), self._schema(b)
        types_a, types_b = dict(a), dict(b)
        conflict = any(
            n in types_b and types_b[n] != t for n, t in types_a.items()
        )
        try:
            merged = merge_schemas(sa, sb)
        except SchemaConflictError:
            assert conflict
            return
        assert not conflict
        names = [f.name for f in merged.fields]
        # old order is a prefix; new fields appended in their order
        assert names[: len(a)] == [n for n, _ in a]
        assert set(names) == {n for n, _ in a} | {n for n, _ in b}

    @given(
        st.lists(st.tuples(ddl_field_names, ddl_types), max_size=4,
                 unique_by=lambda ft: ft[0]),
        st.lists(st.tuples(ddl_field_names, ddl_types), max_size=4,
                 unique_by=lambda ft: ft[0]),
        st.lists(st.tuples(ddl_field_names, ddl_types), max_size=4,
                 unique_by=lambda ft: ft[0]),
    )
    @settings(max_examples=100, deadline=None)
    def test_merge_associative_when_no_conflicts(self, a, b, c):
        from swarm_spark.tablestore import SchemaConflictError, merge_schemas

        sa, sb, sc = self._schema(a), self._schema(b), self._schema(c)
        try:
            left = merge_schemas(merge_schemas(sa, sb), sc)
            right = merge_schemas(sa, merge_schemas(sb, sc))
        except SchemaConflictError:
            return  # conflicts covered by the other property
        assert left == right


class TestBackfillProperties:
    @given(st.lists(st.integers(0, 5000), min_size=0, max_size=40),
           st.integers(1, 8), st.integers(1, 10000))
    @settings(max_examples=100, deadline=None)
    def test_packing_invariants(self, sizes, max_objects, max_bytes):
        import os
        import shutil
        import tempfile

        from swarm_spark.backfill import plan_backfill

        d = tempfile.mkdtemp(prefix="bf_prop_")
        try:
            for i, sz in enumerate(sizes):
                with open(os.path.join(d, f"f{i:04d}"), "wb") as fh:
                    fh.write(b"x" * sz)
            batches = plan_backfill(d, max_objects=max_objects, max_bytes=max_bytes)
            # every file appears exactly once, in sorted order
            all_paths = [p for b in batches for p in b.paths]
            assert all_paths == sorted(
                os.path.join(d, f) for f in os.listdir(d)
            )
            for b in batches:
                assert b.n_objects <= max_objects
                # byte limit holds unless a single oversized object
                assert b.total_bytes <= max_bytes or b.n_objects == 1
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestTextOpProperties:
    """Pure-python differential models for the r3 text operators —
    run through Spark in small batches (deadline=None; one Spark job
    per example set is too slow, so examples are batched per test)."""

    def _spark(self):
        from swarm_spark.session import get_spark

        return get_spark("swarm_spark_tests", cpus=4, shuffle_partitions=4)

    @given(st.lists(
        st.text(alphabet="ab @.", min_size=0, max_size=40), min_size=1, max_size=20))
    @settings(max_examples=20, deadline=None)
    def test_repetition_ratio_differential(self, texts):
        from swarm_spark.operators.textstats import repetition_ratio

        spark = self._spark()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, text string")
        got = {r.i: r.rep for r in df.select(
            "i", repetition_ratio("text").alias("rep")).collect()}

        def model(s: str) -> float:
            toks = [t for t in s.strip().lower().split()] or [""]
            if len(toks) >= 3:
                sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
            else:
                sh = [" ".join(toks)]
            return round((len(sh) - len(set(sh))) / max(len(sh), 1), 4)

        for i, t in enumerate(texts):
            assert abs(got[i] - model(t)) < 1e-9, (t, got[i], model(t))

    @given(st.lists(st.text(
        alphabet="abc01.@+- ", min_size=0, max_size=60), min_size=1, max_size=20))
    @settings(max_examples=20, deadline=None)
    def test_redact_pii_idempotent(self, texts):
        """redact(redact(x)) == redact(x): placeholders contain no
        digits or '@', so a second pass never rewrites."""
        from pyspark.sql import functions as F

        from swarm_spark.operators.textstats import redact_pii

        spark = self._spark()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, text string")
        rows = df.select(
            redact_pii("text").alias("once"),
            redact_pii(redact_pii(F.col("text"))).alias("twice"),
        ).collect()
        for r in rows:
            assert r.once == r.twice
