"""Deterministic scale-up of the driver testdata for LOCAL MEASUREMENT ONLY.

The driver's round-end bench may run at a larger scale factor than the
committed /root/testdata dirs (BENCH_r05.json records sf=1.0). This tool
rebuilds a comparable large dataset from sf0.1 by replicating each table
``k`` times with deterministic key offsets, so optimizations can be
measured at the driver's scale locally. It writes to a NEW directory and
never touches /root/testdata (read-only by contract).

Replication scheme (seedless, fully deterministic):
- fact/dim keys are offset by ``replica * OFF`` consistently across
  foreign keys, so join fan-outs per replica match the original;
- document text gets a per-replica token suffix (``tok`` -> ``tokqK``),
  which preserves the intra-replica duplicate/near-duplicate structure
  exactly (dup docs stay dups) while keeping replicas disjoint in
  shingle space -- scaling does NOT manufacture quadratic cross-replica
  near-dup pairs that the real generator would not produce;
- embeddings get a per-(replica, dim) deterministic sign flip: norms and
  intra-replica cosine structure are preserved, cross-replica cosines
  are scrambled.

Usage: python tools/make_bigsf.py /root/testdata/sf0.1 /root/bigsf/sf1.0 10
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 100_000_000  # key offset per replica; >> any base key


def _offset(table: pa.Table, cols: list[str], k: int) -> pa.Table:
    for c in cols:
        if c in table.column_names:
            idx = table.column_names.index(c)
            newcol = pc.add(table.column(c), pa.scalar(k * OFF, type=table.column(c).type))
            table = table.set_column(idx, c, newcol)
    return table


_TOK = re.compile(r"[A-Za-z0-9]+")


def _suffix_text(texts: list[str | None], k: int) -> list[str | None]:
    suf = f"q{k}"
    return [
        None if t is None else _TOK.sub(lambda m: m.group(0) + suf, t) for t in texts
    ]


def main() -> None:
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    os.makedirs(dst, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t in tables:
        base = pq.read_table(f"{src}/{t}.parquet")
        if t in ("region", "nation"):
            pq.write_table(base, f"{dst}/{t}.parquet")
            print(t, base.num_rows, "(dim, copied)")
            continue
        reps = []
        for k in range(mult):
            rep = _offset(base, key_cols.get(t, []), k)
            if t == "documents" and k > 0:
                texts = _suffix_text(base.column("text").to_pylist(), k)
                tcol = pa.array(texts, type=pa.string())
                rep = rep.set_column(rep.column_names.index("text"), "text", tcol)
                nch = pa.array(
                    [None if x is None else len(x) for x in texts], type=pa.int64()
                )
                rep = rep.set_column(rep.column_names.index("n_chars"), "n_chars", nch)
            if t == "embeddings" and k > 0:
                emb = base.column("embedding").combine_chunks()
                flat = np.asarray(emb.flatten(), dtype=np.float32)
                # deterministic per-(replica, position-in-vector) sign flips
                offsets = np.asarray(emb.offsets)
                dim_idx = np.arange(len(flat)) - np.repeat(
                    offsets[:-1], np.diff(offsets)
                )
                signs = np.where(((dim_idx * 2654435761 + k * 40503) % 97) % 2 == 0, 1.0, -1.0).astype(np.float32)
                arr = pa.ListArray.from_arrays(emb.offsets, pa.array(flat * signs, type=pa.float32()))
                rep = rep.set_column(rep.column_names.index("embedding"), "embedding", arr)
            reps.append(rep)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(t, base.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
