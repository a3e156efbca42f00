#!/usr/bin/env python3
"""Chunked adjudicator for the big minhash replay oracles (q21 at the
500k-doc zipf10 decade), where even the per-stage form of
cte_stage_profile.py exceeds the VM's disk: the `sigv` stage is a
shingles x permutations cross join (50.5M x 128 = 6.5B intermediate
rows) whose single grouped aggregation spills more than the volume
holds. Splitting the cross join by permutation index is EXACTLY
equivalent — `sigv` groups by (doc_id, i), and `i % chunks = k`
partitions those groups — so materializing one permutation batch at a
time bounds the working set to 1/chunks of the monolith with zero
semantic drift. Everything before `sigv` is staged once (temp tables,
like cte_stage_profile), everything after runs as one WITH over the
staged tables, and the final comparison reuses oracle_check.rows_key
so this adjudicator cannot drift from the driver's gate.

Usage: python3 tools/chunked_minhash_oracle.py <verify_out_dir> <sf_dir> <query> [chunks]
Env: DUCKDB_MEMORY_LIMIT, DUCKDB_TEMP_DIR (same as oracle_check.py)
"""
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cte_stage_profile import split_ctes  # noqa: E402
from oracle_check import rows_key  # noqa: E402


def main(out_dir, sf_dir, query, chunks=8):
    con = duckdb.connect()
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def spill():
        d = os.environ.get("DUCKDB_TEMP_DIR")
        if not d or not os.path.isdir(d):
            return 0
        return sum(os.path.getsize(os.path.join(d, f))
                   for f in os.listdir(d)) // (1 << 20)

    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[query]
    ctes, final = split_ctes(sql)
    names = [n for n, _, _ in ctes]
    assert "sigv" in names, f"no sigv stage to chunk in {query} ({names})"
    cut = names.index("sigv")
    for n, _, b in ctes[:cut]:
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE {n} AS {b}")
        rows = con.sql(f"SELECT COUNT(*) FROM {n}").fetchone()[0]
        print(f"{n:10s} {time.time()-t0:8.1f}s {rows:>12,} rows "
              f"spill={spill()}MB", flush=True)

    sig_body = ctes[cut][2]
    anchor = "CROSS JOIN perm p"
    assert anchor in sig_body, "sigv stage shape changed; update the chunker"
    for k in range(chunks):
        t0 = time.time()
        body = sig_body.replace(
            anchor, f"CROSS JOIN (SELECT * FROM perm WHERE i % {chunks} = {k}) p")
        con.execute(f"CREATE TEMP TABLE sigv_{k} AS {body}")
        rows = con.sql(f"SELECT COUNT(*) FROM sigv_{k}").fetchone()[0]
        print(f"sigv[{k}/{chunks}] {time.time()-t0:6.1f}s {rows:>12,} rows "
              f"spill={spill()}MB", flush=True)
    con.execute("CREATE TEMP TABLE sigv AS " + " UNION ALL ".join(
        f"SELECT * FROM sigv_{k}" for k in range(chunks)))
    for k in range(chunks):
        con.execute(f"DROP TABLE sigv_{k}")

    tail_ctes = ctes[cut + 1:]
    q = final
    if tail_ctes:
        tail = ",\n".join(f"{n} AS ({b})" for n, _, b in tail_ctes)
        q = f"WITH {tail}\n{final}"
    t0 = time.time()
    exp_rel = con.sql(q)
    exp_names = [c.lower() for c in exp_rel.columns]
    exp = exp_rel.fetchall()
    print(f"{'FINAL':10s} {time.time()-t0:8.1f}s {len(exp):>12,} rows")

    got_rel = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/{query}/*.parquet')")
    got_names = [c.lower() for c in got_rel.columns]
    got = got_rel.fetchall()
    a, b = rows_key(got, got_names), rows_key(exp, exp_names)
    if sorted(got_names) != sorted(exp_names):
        print(f"FAIL {query}: columns {sorted(got_names)} != {sorted(exp_names)}")
        return 1
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {query}: {len(a)} vs {len(b)} rows; first diffs: {diffs}")
        return 1
    print(f"PASS {query} ({len(a)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 8))
