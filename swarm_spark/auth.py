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
    role 'analyst' sees only rows where sink != 'sink_errors'.

    `table` (optional, fnmatch glob) scopes the filter to matching
    table names: a filter on a column that exists only in some tables
    MUST be scoped, otherwise reading an unrelated table that lacks
    the column (or worse, has a same-named unrelated column) would
    fail or silently mis-filter. Policy application is fail-closed on
    ambiguity: an applicable filter whose column is absent from the
    frame raises a configuration error naming the fix, and a
    table-scoped filter evaluated against a frame with no table
    identity raises rather than guessing (see AccessPolicy.apply)."""

    principal_attr: str   # request attr whose value selects the filter
    principal_value: str
    column: str           # DataFrame column the predicate runs on
    op: str
    value: str | tuple | list
    negate: bool = False
    table: str | None = None  # fnmatch glob over table names; None = all

    def applies_to(self, table_name: str | None) -> bool:
        """Whether this filter targets the given table. Unscoped
        filters target everything; scoped filters need a concrete
        table name to match (None → no match decision possible; the
        caller raises)."""
        if self.table is None:
            return True
        if table_name is None:
            raise ValueError(
                f"row filter on {self.column!r} is scoped to table "
                f"{self.table!r} but the frame has no table identity; "
                "pass table_name= to AccessPolicy.apply (GuardedTable "
                "does this automatically)"
            )
        import fnmatch

        return fnmatch.fnmatchcase(table_name, self.table)

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"row filter on {self.column!r}: unknown op {self.op!r}")
        if self.op == "in":
            # list('admin') == ['a','d','m','i','n'] — a bare string
            # would silently match single-character values, so the
            # membership set must be an explicit sequence of strings
            if isinstance(self.value, str) or not isinstance(self.value, (list, tuple)):
                raise ValueError(
                    f"row filter on {self.column!r}: op 'in' requires a "
                    f"list/tuple of strings, got {type(self.value).__name__}"
                )
        elif not isinstance(self.value, str):
            raise ValueError(
                f"row filter on {self.column!r}: op {self.op!r} requires a string value"
            )

    def predicate(self) -> F.Column:
        c = F.col(self.column)
        if self.op == "eq":
            p = c == F.lit(self.value)
        elif self.op == "startswith":
            p = c.startswith(self.value)
        elif self.op == "endswith":
            p = c.endswith(self.value)
        elif self.op == "contains":
            p = c.contains(self.value)
        elif self.op == "rlike":
            p = c.rlike(self.value)
        else:  # "in" — __post_init__ guarantees a list/tuple
            p = c.isin(*self.value)
        return ~p if self.negate else p


@dataclass
class AccessPolicy:
    """allow_rules: the Rego allow set (empty + default_deny → deny
    everything, matching `default deny = true` with no allow body that
    fires). Pass policy=None at the call site for swarm's EmptyAuth
    behavior (no policy configured → allow all)."""

    allow_rules: list[AllowRule] = field(default_factory=list)
    row_filters: list[RowFilter] = field(default_factory=list)
    # principal_value -> columns hidden from that principal; an entry
    # may be table-scoped as "glob:column" (e.g. "sink_*:text") —
    # unscoped entries mask the column in every table
    column_masks: dict = field(default_factory=dict)
    mask_attr: str = "role"
    default_deny: bool = True

    def authorize(self, request: dict) -> bool:
        if any(r.matches(request) for r in self.allow_rules):
            return True
        return not self.default_deny

    def masked_columns(self, request: dict, table_name: str | None = None) -> set:
        """Effective masked-column set for this principal and table.
        Table-scoped entries ("glob:column") with no table identity
        available still mask (hiding extra is the safe direction,
        unlike row filters where a wrong guess changes row sets)."""
        import fnmatch

        out = set()
        for entry in self.column_masks.get(_dig(request, self.mask_attr), []):
            if ":" in entry:
                pat, col = entry.split(":", 1)
                if table_name is None or fnmatch.fnmatchcase(table_name, pat):
                    out.add(col)
            else:
                out.add(entry)
        return out

    def apply(
        self, df: DataFrame, request: dict, table_name: str | None = None
    ) -> DataFrame:
        """authorize + row/column restriction. Raises Unauthorized on
        deny; otherwise returns the policy-narrowed DataFrame.
        table_name scopes table-qualified filters/masks; an applicable
        row filter whose column the frame lacks is a configuration
        error (raised with guidance), never a silent skip — a skipped
        row filter would fail open."""
        if not self.authorize(request):
            raise Unauthorized("denied by policy")
        out = df
        cols = set(df.columns)
        for rf in self.row_filters:
            if not _match(_dig(request, rf.principal_attr), "eq", rf.principal_value):
                continue
            if not rf.applies_to(table_name):
                continue
            if rf.column not in cols:
                raise ValueError(
                    f"row filter on {rf.column!r} applies to "
                    f"table {table_name or '<frame>'!r} but the column is "
                    "absent; scope the filter with table='<glob>' so it "
                    "targets only tables that carry the column"
                )
            out = out.filter(rf.predicate())
        masked = self.masked_columns(request, table_name)
        if masked:
            keep = [c for c in out.columns if c not in masked]
            out = out.select(*keep)
        return out


def authorize(policy: AccessPolicy | None, request: dict) -> bool:
    """Module-level entry matching swarm's Authorize: no policy
    configured → allow (auth_test.go 'EmptyAuth')."""
    if policy is None:
        return True
    return policy.authorize(request)


class GuardedTable:
    """Policy-fronted table handle: reads come back row-filtered and
    column-masked for the bound principal; EVERY other table method —
    mutators and metadata alike, including ones future table classes
    add — re-checks authorize via __getattr__, and snapshot metadata
    (current_snapshot/snapshots) has masked columns scrubbed from its
    embedded schema so no entry leaks column names the principal
    cannot read. Obtained via GuardedCatalog.table()."""

    def __init__(self, inner, policy: AccessPolicy | None, request: dict):
        self._inner = inner
        self._policy = policy
        self._request = request

    def _check(self):
        if self._policy is not None and not self._policy.authorize(self._request):
            raise Unauthorized("denied by policy")

    def _masked_columns(self) -> set:
        if self._policy is None:
            return set()
        return self._policy.masked_columns(
            self._request, getattr(self._inner, "name", None)
        )

    def _scrub_snapshot(self, snap):
        masked = self._masked_columns()
        if not isinstance(snap, dict) or not masked or "schema" not in snap:
            return snap
        import json as _json

        out = dict(snap)
        try:
            sch = _json.loads(snap["schema"])
            sch["fields"] = [
                f for f in sch.get("fields", []) if f.get("name") not in masked
            ]
            out["schema"] = _json.dumps(sch)
        except (TypeError, ValueError):
            out["schema"] = None  # unknown encoding: hide, never leak
        return out

    def read(self, spark, *a, **kw) -> DataFrame:
        self._check()
        df = self._inner.read(spark, *a, **kw)
        if self._policy is None:
            return df
        return self._policy.apply(
            df, self._request, table_name=getattr(self._inner, "name", None)
        )

    def schema(self):
        """Masked columns are hidden from the visible schema too —
        a principal must not learn column names it cannot read."""
        self._check()
        s = self._inner.schema()
        masked = self._masked_columns()
        if s is None or not masked:
            return s
        from pyspark.sql import types as T

        return T.StructType([f for f in s.fields if f.name not in masked])

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if callable(attr):
            def gated(*a, **kw):
                self._check()
                out = attr(*a, **kw)
                # scrub masked columns out of ANY snapshot-shaped
                # return value (current_snapshot, snapshots, and every
                # mutator returns the committed snapshot dict) — no
                # entry may leak column names the principal can't read
                if isinstance(out, dict):
                    return self._scrub_snapshot(out)
                if isinstance(out, list) and any(isinstance(s, dict) for s in out):
                    return [self._scrub_snapshot(s) for s in out]
                # ANY DataFrame-shaped return is a read surface —
                # read_incremental, read_changelog, read_stage, and
                # whatever future table classes add — and gets the
                # same row filters + column masks as read(); without
                # this, the changelog/incremental scans would be a
                # governance bypass
                if isinstance(out, DataFrame) and self._policy is not None:
                    return self._policy.apply(
                        out, self._request,
                        table_name=getattr(self._inner, "name", None))
                return out

            return gated
        # non-callables (table name/paths) are still entries — gate
        # them at access time so a denied principal learns nothing
        self._check()
        return attr


class GuardedCatalog:
    """Data-plane analogue of swarm's HTTP auth middleware
    (/root/reference/pkg/controller/server/middleware.go:17-46): the
    reference fronts EVERY server entry with Authorize; here every
    catalog entry obtained through this handle is policy-checked, so a
    caller holding the catalog cannot bypass row filters or column
    masks. Bind one handle per request principal:

        cat = GuardedCatalog(IcepackCatalog(wh), policy, request)
        cat.table("sink_user").read(spark)   # filtered + masked

    policy=None preserves swarm's EmptyAuth behavior (allow all,
    unfiltered). The inner catalog object should not be handed out —
    the guard wraps, it does not mutate."""

    def __init__(self, inner, policy: AccessPolicy | None, request: dict):
        self._inner = inner
        self._policy = policy
        self._request = request

    def _check(self):
        if self._policy is not None and not self._policy.authorize(self._request):
            raise Unauthorized("denied by policy")

    @property
    def supports_adopt(self) -> bool:
        return getattr(self._inner, "supports_adopt", False)

    def table(self, name: str) -> GuardedTable:
        self._check()
        return GuardedTable(self._inner.table(name), self._policy, self._request)

    def tables(self) -> list[str]:
        self._check()
        return self._inner.tables()
