"""Access-policy analogue of swarm's auth layer, compiled like
EventRule.

swarm authorizes HTTP requests through a Rego `auth` package
(/root/reference/pkg/usecase/auth.go:16-43, docs/rule.md:184-283):
default deny, `deny := false { allow }`, allow rules are an OR'd set
over request attributes; no policy configured → allow all
(undefined deny == false). The reference's golden behavior is pinned
by pkg/controller/server/testdata/policy/auth_token.rego (bearer-token
allow) and the auth_test.go matrix (AllowAll / Allowed / NotAllowed /
EmptyToken / EmptyAuth).

In a batch engine the same policy object guards DATA access, so the
rebuild carries the Rego semantics to both planes:

  * REQUEST plane — `AccessPolicy.authorize(request)`: pure-Python
    evaluation of the allow set against a request dict (method, path,
    principal attributes...). Default deny, any-allow wins, no policy
    → allow.
  * DATA plane — `AccessPolicy.apply(df, request)`: after authorize,
    per-principal ROW filters (compiled to codegen'd Column
    predicates, same op set as EventRule) and COLUMN masks (selected
    away, like drop_fields) restrict what the principal reads. Filters
    evaluate inside the scan — predicate pushdown applies — so policy
    costs no extra pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = ("eq", "startswith", "endswith", "contains", "rlike", "in")


class Unauthorized(PermissionError):
    """≙ types.ErrUnauthorized ('denied by policy', auth.go:38-40)."""


def _match(value, op: str, expected) -> bool:
    """Python twin of EventRule.predicate for request dicts. A missing
    attribute never matches (Rego: undefined input path → rule body
    fails)."""
    if value is None:
        return False
    if isinstance(value, (list, tuple)):
        # header/query values are arrays: input.query.token[_] == v
        return any(_match(v, op, expected) for v in value)
    s = str(value)
    if op == "eq":
        return s == expected
    if op == "startswith":
        return s.startswith(expected)
    if op == "endswith":
        return s.endswith(expected)
    if op == "contains":
        return expected in s
    if op == "rlike":
        import re

        return re.search(expected, s) is not None
    if op == "in":
        return s in expected
    raise ValueError(f"unknown op {op!r}")


@dataclass(frozen=True)
class AllowRule:
    """One `allow { ... }` body: every condition must hold (AND);
    rules in a policy OR together (the Rego allow SET)."""

    rule_id: str
    conditions: tuple  # of (attr, op, value)

    def __post_init__(self):
        for attr, op, _ in self.conditions:
            if op not in _OPS:
                raise ValueError(f"rule {self.rule_id}: unknown op {op!r}")
            if not attr:
                raise ValueError(f"rule {self.rule_id}: empty attribute")

    def matches(self, request: dict) -> bool:
        return all(
            _match(_dig(request, attr), op, expected)
            for attr, op, expected in self.conditions
        )


def _dig(request: dict, attr: str):
    """Dotted-path lookup: 'header.Authorization' → request['header']
    ['Authorization']; missing segments → None (undefined)."""
    cur = request
    for part in attr.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


@dataclass(frozen=True)
class RowFilter:
    """Row-level restriction for one principal attribute value: e.g.
    role 'analyst' sees only rows where sink != 'sink_errors'."""

    principal_attr: str   # request attr whose value selects the filter
    principal_value: str
    column: str           # DataFrame column the predicate runs on
    op: str
    value: str
    negate: bool = False

    def predicate(self) -> F.Column:
        c = F.col(self.column)
        p = {
            "eq": c == F.lit(self.value),
            "startswith": c.startswith(self.value),
            "endswith": c.endswith(self.value),
            "contains": c.contains(self.value),
            "rlike": c.rlike(self.value),
            "in": c.isin(list(self.value)),
        }[self.op]
        return ~p if self.negate else p


@dataclass
class AccessPolicy:
    """allow_rules: the Rego allow set (empty + default_deny → deny
    everything, matching `default deny = true` with no allow body that
    fires). Pass policy=None at the call site for swarm's EmptyAuth
    behavior (no policy configured → allow all)."""

    allow_rules: list[AllowRule] = field(default_factory=list)
    row_filters: list[RowFilter] = field(default_factory=list)
    # principal_value -> columns hidden from that principal
    column_masks: dict = field(default_factory=dict)
    mask_attr: str = "role"
    default_deny: bool = True

    def authorize(self, request: dict) -> bool:
        if any(r.matches(request) for r in self.allow_rules):
            return True
        return not self.default_deny

    def apply(self, df: DataFrame, request: dict) -> DataFrame:
        """authorize + row/column restriction. Raises Unauthorized on
        deny; otherwise returns the policy-narrowed DataFrame."""
        if not self.authorize(request):
            raise Unauthorized("denied by policy")
        out = df
        for rf in self.row_filters:
            if _match(_dig(request, rf.principal_attr), "eq", rf.principal_value):
                out = out.filter(rf.predicate())
        masked = self.column_masks.get(_dig(request, self.mask_attr), [])
        if masked:
            keep = [c for c in out.columns if c not in set(masked)]
            out = out.select(*keep)
        return out


def authorize(policy: AccessPolicy | None, request: dict) -> bool:
    """Module-level entry matching swarm's Authorize: no policy
    configured → allow (auth_test.go 'EmptyAuth')."""
    if policy is None:
        return True
    return policy.authorize(request)
