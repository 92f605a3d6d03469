"""Record normalization: nil-strip, deterministic IDs, timestamps.

Mirrors the semantics pinned by the reference's tests (not its code
structure):

* nil-strip — /root/reference/pkg/usecase/utils.go:14-154, semantics
  pinned by pkg/usecase/utils_test.go:11-85: drop null-valued object
  keys, drop nulls inside arrays, drop keys whose value is an empty
  array/object, but KEEP an object key whose dict became empty after
  stripping nested nulls. Rationale (load.go:242): nulls break type
  inference.
* deterministic content-hash id — pkg/domain/types/types.go:27-34
  (md5 of the JSON-marshaled, nil-stripped payload; idempotency pinned
  by types_test.go:90-121). Go's json.Marshal sorts map keys, so the
  canonical form here is sorted-key compact JSON.
* float-seconds → TIMESTAMP with fraction — pkg/usecase/load.go:236-239
  (`time.Unix(int64(ts), mod(ts,1)*1e9)`).

Two implementations of nil-strip:
* ``nil_strip_struct_cols`` — for FIXED envelope schemas, pure Column
  logic (to_json with ignoreNullFields drops nulls JVM-side). Fast path.
* ``nil_strip_json_udf`` — for OPEN JSON payloads, an Arrow-batched
  pandas UDF (the one genuinely dynamic step; still no row-at-a-time
  Python UDF — batches arrive as pandas Series).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _clone(value):
    """(value, ok) recursion mirroring swarm's clone (utils.go:19-135,
    goldens in utils_test.go:11-85). ok=False means the parent drops
    this value entirely:

    - None                       → ok=False
    - dict: originally empty     → ok=False; otherwise recurse, drop
      not-ok entries; a dict that STRIPS to empty stays (ok=True)
    - list: recurse, drop not-ok elements; empty or EMPTIED list
      → ok=False (so empty containers inside arrays drop too)
    - scalars                    → ok=True
    """
    if value is None:
        return None, False
    if isinstance(value, dict):
        if not value:
            return value, False
        out = {}
        for k, v in value.items():
            if v is None:
                continue
            c, ok = _clone(v)
            if ok:
                out[k] = c
        return out, True
    if isinstance(value, list):
        arr = []
        for v in value:
            c, ok = _clone(v)
            if ok:
                arr.append(c)
        if not arr:
            return value, False
        return arr, True
    return value, True


def strip_nils(value):
    """Python twin of swarm's cloneWithoutNil (utils.go:14-17): the
    top-level value is returned unchanged when the recursion says
    'drop' (Go ignores the ok flag at the root)."""
    stripped, ok = _clone(value)
    return stripped if ok else value


def canonical_json(value) -> str:
    """Compact, sorted-key JSON — Go json.Marshal's map-key ordering."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


@F.pandas_udf(T.StringType())
def nil_strip_json_udf(payload: pd.Series) -> pd.Series:
    """Arrow-batched nil-strip over a JSON-string payload column.
    Returns canonical (sorted-key, compact) JSON of the stripped value,
    null where input is null/invalid."""

    def one(s):
        if s is None or (isinstance(s, float) and pd.isna(s)):
            return None
        try:
            return canonical_json(strip_nils(json.loads(s)))
        except (ValueError, TypeError):
            return None

    return payload.map(one)


@F.pandas_udf(T.StringType())
def content_hash_json_udf(payload: pd.Series) -> pd.Series:
    """md5 of the nil-stripped canonical JSON payload — swarm's LogID
    (types.go:27-34) for open payloads."""
    import hashlib

    def one(s):
        if s is None or (isinstance(s, float) and pd.isna(s)):
            return None
        try:
            canon = canonical_json(strip_nils(json.loads(s)))
        except (ValueError, TypeError):
            return None
        return hashlib.md5(canon.encode("utf-8")).hexdigest()

    return payload.map(one)


def content_hash_id(payload_struct: Column) -> Column:
    """Fast-path deterministic id for FIXED-schema payloads:
    md5(to_json(struct)). to_json drops null fields (Spark default
    ignoreNullFields=true) which matches nil-strip for scalar nulls;
    struct field order is fixed at plan time, so the hash is stable —
    the idempotency contract of types_test.go:90-121."""
    return F.md5(F.to_json(payload_struct))


def ts_from_unix_seconds(col: Column) -> Column:
    """float unix-seconds → TIMESTAMP preserving sub-second fraction
    (load.go:236-239). timestamp_seconds accepts fractional doubles."""
    return F.timestamp_seconds(col)


def drop_struct_fields(struct_col: Column, fields: list[str]) -> Column:
    """Field removal ≙ Rego json.patch remove (/root/reference/README.md:56)."""
    out = struct_col
    for f_ in fields:
        out = out.dropFields(f_)
    return out
