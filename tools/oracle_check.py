#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: read each query's
parquet output from Verify, run its oracle SQL in DuckDB over the same
testdata tables, and compare row sets. Not part of the shipped library
(the library is pure Scala/Spark); this is local test tooling only.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [name_regex]

The optional third arg restricts the run to query names matching the
regex — big-scale sweeps die mid-run (disk-full spill, OOM-killed
replay oracles) and the rerun should not repay the 60 queries that
already passed; merge_sweep_logs.py merges partial logs rerun-wins.
"""
import json
import math
import re
import sys

import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def rows_key(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main(out_dir, sf_dir, name_regex=None):
    con = duckdb.connect()
    # Big-scale sweeps (sf1.0) spill tens of GB on the hash-replay
    # oracles; let the caller size memory and point the spill at a
    # volume with room instead of cwd/.tmp.
    import os
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if name_regex:
        oracles = {k: v for k, v in oracles.items()
                   if re.search(name_regex, k)}
        if not oracles:
            # a typo'd rerun regex must not read as a green sweep
            print(f"FAIL <filter>: name_regex {name_regex!r} matches no oracle")
            return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_names = [c.lower() for c in got_rel.columns]
            got_types = [str(t) for t in got_rel.types]
            got = rows_key(got_rel.fetchall(), got_names)
            exp_rel = con.sql(sql)
            exp_names = [c.lower() for c in exp_rel.columns]
            exp_types = [str(t) for t in exp_rel.types]
            exp = rows_key(exp_rel.fetchall(), exp_names)
            # The driver hashes DuckDB-visible column TYPES too (a HUGEINT
            # SUM vs Spark's BIGINT fails its gate even with equal values),
            # so compare types by sorted column name, not just values.
            got_typed = sorted(zip(got_names, got_types))
            exp_typed = sorted(zip(exp_names, exp_types))
            if sorted(got_names) != sorted(exp_names):
                print(f"FAIL {name}: columns {sorted(got_names)} != {sorted(exp_names)}")
                n_fail += 1
            elif got_typed != exp_typed:
                diffs = [(a, b) for a, b in zip(got_typed, exp_typed) if a != b]
                print(f"FAIL {name}: column types differ: {diffs}")
                n_fail += 1
            elif got != exp:
                diffs = [(a, b) for a, b in zip(got, exp) if a != b][:3]
                print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; first diffs: {diffs}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
