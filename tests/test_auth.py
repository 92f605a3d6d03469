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
