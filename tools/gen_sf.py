"""Deterministic scale-factor upsampler: builds sfN from the driver's
sf0.1 tables by K key-shifted copies (no external data, no wall-clock
randomness — rerunning always produces byte-identical logic).

Per-table handling:
  * region / nation — fixed-cardinality dimensions, copied as-is
    (TPC-H semantics: dims don't scale with sf).
  * customer / supplier / part / orders / lineitem / events — K copies
    with every key column shifted by i * (max_key+1), foreign keys
    shifted by the SAME stride as their parent so joins stay valid.
  * documents — copy 0 is the original corpus; copies i>0 additionally
    replace every 3rd token with a copy-unique token. Every word
    3-shingle contains at least one position ≡ 0 (mod 3), so CROSS-COPY
    shingle overlap is exactly zero: the dedup/similarity oracles stay
    ~K× the sf0.1 cost instead of K²× (plain duplication would put
    every doc in a 10-way exact-dup clique and square the inverted-
    index join's intermediate).
  * embeddings — K copies with a seeded N(0, 0.02) perturbation per
    copy (copy 0 unperturbed) so no two vectors are bit-identical and
    top-k ties stay deterministic.

Usage: python tools/gen_sf.py --src /root/testdata/sf0.1 \
           --dst dist/sf1 --copies 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> parent stride group; every column in a group shifts by
# the parent table's stride so FK joins survive the copy
KEY_GROUPS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ["region", "nation"]


def _strides(src: str) -> dict[str, int]:
    out = {}
    for tbl, cols in KEY_GROUPS.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        for col, group in cols.items():
            mx = pc.max(t[col]).as_py()
            out[group] = max(out.get(group, 0), int(mx) + 1)
    return out


def _mutate_texts(texts: list[str | None], copy: int) -> list[str | None]:
    tag = f"c{copy}x"
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        toks = s.split(" ")
        for j in range(0, len(toks), 3):
            toks[j] = f"{tag}{j}"
        out.append(" ".join(toks))
    return out


def upsample_table(src: str, dst: str, tbl: str, copies: int,
                   strides: dict[str, int]) -> int:
    t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
    if tbl in COPY_AS_IS or copies == 1:
        pq.write_table(t, os.path.join(dst, f"{tbl}.parquet"))
        return t.num_rows

    parts = [t]
    for i in range(1, copies):
        cols = {}
        for name in t.column_names:
            col = t[name]
            group = KEY_GROUPS.get(tbl, {}).get(name)
            if group is not None:
                col = pc.add(col, i * strides[group]).cast(col.type)
            cols[name] = col
        c = pa.table(cols)
        if tbl == "documents":
            texts = _mutate_texts(c["text"].to_pylist(), i)
            arr = pa.array(texts, type=c["text"].type)
            c = c.set_column(c.column_names.index("text"), "text", arr)
            n_chars = pa.array(
                [len(s) if s is not None else None for s in texts],
                type=c["n_chars"].type,
            )
            c = c.set_column(c.column_names.index("n_chars"), "n_chars", n_chars)
        elif tbl == "embeddings":
            rng = np.random.default_rng(1000 + i)
            vecs = c["embedding"].to_pylist()
            pert = [
                None if v is None else
                (np.asarray(v, dtype=np.float32)
                 + rng.normal(0, 0.02, len(v)).astype(np.float32)).tolist()
                for v in vecs
            ]
            arr = pa.array(pert, type=c["embedding"].type)
            c = c.set_column(c.column_names.index("embedding"), "embedding", arr)
        parts.append(c)
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(dst, f"{tbl}.parquet"))
    return out.num_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    strides = _strides(args.src)
    for tbl in COPY_AS_IS + list(KEY_GROUPS):
        n = upsample_table(args.src, args.dst, tbl, args.copies, strides)
        print(f"{tbl:12s} {n:>9d} rows")


if __name__ == "__main__":
    main()
