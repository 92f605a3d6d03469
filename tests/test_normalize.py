"""Golden semantics cases lifted from the reference's unit tests
(FIXTURES.md §4): nil-strip (utils_test.go:11-85), content-hash id
idempotency (types_test.go:90-121)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from swarm_spark.functions.normalize import (
    canonical_json,
    content_hash_json_udf,
    nil_strip_json_udf,
    strip_nils,
)


class TestStripNils:
    def test_null_key_dropped(self):
        # utils_test.go: {"field":null,"color":"blue"} → {"color":"blue"}
        assert strip_nils({"field": None, "color": "blue"}) == {"color": "blue"}

    def test_empty_array_dropped(self):
        assert strip_nils({"a": [], "b": 1}) == {"b": 1}

    def test_nil_elements_dropped_from_array(self):
        assert strip_nils({"a": [1, None, 2]}) == {"a": [1, 2]}

    def test_array_emptied_by_strip_dropped(self):
        assert strip_nils({"a": [None, None], "b": 1}) == {"b": 1}

    def test_nested_map_emptied_by_strip_kept(self):
        # utils_test.go: nested map that becomes empty after stripping
        # is KEPT (only originally-empty maps are dropped)
        assert strip_nils({"m": {"x": None}, "b": 1}) == {"m": {}, "b": 1}

    def test_originally_empty_map_dropped(self):
        assert strip_nils({"m": {}, "b": 1}) == {"b": 1}

    def test_deep_nesting(self):
        v = {"a": {"b": {"c": None, "d": 5}}, "e": [{"f": None}, {"g": 1}]}
        assert strip_nils(v) == {"a": {"b": {"d": 5}}, "e": [{}, {"g": 1}]}

    def test_scalars_pass_through(self):
        assert strip_nils(42) == 42
        assert strip_nils("x") == "x"

    # -- Go slice-branch parity (utils.go:96-111 'slice with empty'
    # family): elements that ARE or BECOME empty containers drop from
    # arrays, and an array emptied that way drops from its parent --
    def test_empty_dict_element_dropped_from_array(self):
        assert strip_nils({"a": [{}, "x"]}) == {"a": ["x"]}

    def test_empty_list_element_dropped_from_array(self):
        assert strip_nils({"a": [[], "x"]}) == {"a": ["x"]}

    def test_emptied_list_element_dropped_from_array(self):
        # [None] strips to [] → ok=false → dropped from the outer array
        assert strip_nils({"a": [[None], "x"]}) == {"a": ["x"]}

    def test_array_of_only_empty_containers_dropped(self):
        assert strip_nils({"a": [{}, [], [None]], "b": 1}) == {"b": 1}

    def test_nonempty_dict_element_that_strips_to_empty_kept(self):
        # mirrors the map branch: originally-NON-empty maps survive
        # even when stripping empties them (clone returns ok=true)
        assert strip_nils({"a": [{"x": None}, "y"]}) == {"a": [{}, "y"]}

    def test_top_level_slice(self):
        # utils_test.go 'slice with empty': [nil,"blue"] → ["blue"]
        assert strip_nils([None, "blue"]) == ["blue"]

    def test_top_level_empty_stays(self):
        # cloneWithoutNil ignores ok at the root (utils.go:14-17)
        assert strip_nils({}) == {}
        assert strip_nils([]) == []


class TestCanonicalJson:
    def test_sorted_keys_compact(self):
        # Go json.Marshal sorts map keys
        assert canonical_json({"b": 1, "a": 2}) == '{"a":2,"b":1}'


class TestVectorizedUdfs:
    def test_nil_strip_udf(self, spark):
        df = spark.createDataFrame(
            [('{"field":null,"color":"blue"}',), ('{"a":[],"b":1}',), (None,), ("not json",)],
            "payload string",
        )
        out = [r[0] for r in df.select(nil_strip_json_udf("payload")).collect()]
        assert out[0] == '{"color":"blue"}'
        assert out[1] == '{"b":1}'
        assert out[2] is None
        assert out[3] is None

    def test_content_hash_idempotent_100x(self, spark):
        """types_test.go:90-121 — same payload → same id, always."""
        payload = json.dumps({"z": 1, "a": {"nested": True}, "junk": None})
        df = spark.range(100).select(F.lit(payload).alias("p"))
        ids = {r[0] for r in df.select(content_hash_json_udf("p")).collect()}
        assert len(ids) == 1

    def test_content_hash_key_order_invariant(self, spark):
        df = spark.createDataFrame(
            [('{"a":1,"b":2}',), ('{"b":2,"a":1}',)], "p string"
        )
        ids = {r[0] for r in df.select(content_hash_json_udf("p")).collect()}
        assert len(ids) == 1  # canonicalization makes order irrelevant

    def test_fixed_struct_content_hash(self, spark):
        from swarm_spark.functions.normalize import content_hash_id

        df = spark.createDataFrame([("c1", 0), ("c1", 0)], "conv_id string, turn_idx int")
        ids = [
            r[0]
            for r in df.select(
                content_hash_id(F.struct("conv_id", "turn_idx"))
            ).collect()
        ]
        assert ids[0] == ids[1]
        assert len(ids[0]) == 32

    def test_ts_fraction_preserved(self, spark):
        from swarm_spark.functions.normalize import ts_from_unix_seconds

        df = spark.createDataFrame([(1234567890.25,)], "t double")
        (row,) = df.select(ts_from_unix_seconds(F.col("t")).alias("ts")).collect()
        assert row.ts.microsecond == 250000  # load.go:236-239 keeps fraction


class TestDropFields:
    def test_drop_struct_fields(self, spark):
        from swarm_spark.functions.normalize import drop_struct_fields

        df = spark.createDataFrame([((1, 2, 3),)], "s struct<a:int,b:int,c:int>")
        (row,) = df.select(drop_struct_fields(F.col("s"), ["b"]).alias("s")).collect()
        assert row.s.asDict() == {"a": 1, "c": 3}
