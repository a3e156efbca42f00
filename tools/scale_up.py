#!/usr/bin/env python3
"""Deterministic scale-up of the driver-generated testdata: build an
sfN directory as F referentially-consistent copies of a source sf dir.
Dev-side tooling only (like oracle_check.py) — the shipped library is
pure Scala/Spark; this exists so the engine and the DuckDB oracle can
be stress-swept at 10x the largest driver-provided scale on identical
inputs.

Copy k = 0 is the source data unchanged (fixture constants that pin
specific ids — query vectors, IVF centroids — keep meaning). Copy
k > 0 remaps every primary/foreign key by k * OFFSET chosen per table
so joins stay within-copy and ids stay below the query fixtures'
1M/2M/3M synthetic-corpus offsets. Dimension tables (region, nation)
are NOT duplicated — copies share them, like tenants sharing a
calendar dimension.

documents.text for k > 0 is a stride permutation of the source
tokens (stride coprime to the token count): same token multiset, same
length (n_chars stays exact), but adjacency is destroyed, so copies
are NOT near-duplicates of each other and the corpus scales like the
driver's all-distinct word salad instead of planting 45 spurious
near-dup pairs per document. embeddings keep identical vectors per
copy — exact-duplicate floods are the documented pre-collapse stress.

Schema (including events' TIMESTAMP(MICROS, isAdjustedToUTC=0)) is
preserved bit-for-bit so Spark's parquet decoding and DuckDB read the
copies exactly like driver data.

Usage: python3 tools/scale_up.py /root/testdata/sf0.1 <dst_dir> 10
"""
import math
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns -> per-copy offset (max source id << offset)
REMAP = {
    "region": {},          # shared dimension: single copy
    "nation": {},          # shared dimension: single copy
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}

SHARED = {"region", "nation"}


def permute_text(text, k):
    """Stride permutation of the whitespace tokens: deterministic,
    length-preserving, adjacency-destroying (no inherited shingles)."""
    toks = text.split(" ")
    n = len(toks)
    if n <= 3:
        return text
    s = 2 * k + 1
    while math.gcd(s, n) != 1:
        s += 2
    return " ".join(toks[(i * s) % n] for i in range(n))


def scale_table(name, src, dst, factor):
    t = pq.read_table(f"{src}/{name}.parquet")
    if name in SHARED:
        pq.write_table(t, f"{dst}/{name}.parquet", version="2.6")
        return t.num_rows, t.num_rows
    copies = []
    for k in range(factor):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            off = REMAP[name].get(field.name)
            if off is not None and k > 0:
                col = pc.add(col, pa.scalar(k * off, type=field.type))
            elif name == "documents" and field.name == "text" and k > 0:
                col = pa.array([permute_text(v.as_py(), k) for v in
                                col.combine_chunks()], type=field.type)
            cols.append(col)
        copies.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet", version="2.6")
    return t.num_rows, out.num_rows


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in REMAP:
        before, after = scale_table(name, src, dst, factor)
        print(f"{name}: {before} -> {after}")
        # schema must survive bit-for-bit (nanos timestamps included)
        assert pq.read_schema(f"{dst}/{name}.parquet").equals(
            pq.read_schema(f"{src}/{name}.parquet")), f"{name} schema drift"
    print("done")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
