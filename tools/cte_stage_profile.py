#!/usr/bin/env python3
"""Stage-profile a monolithic WITH-pipeline oracle: split the top-level
CTE list, run each CTE as CREATE TEMP TABLE in order, and report
per-stage wall time / row count / spill growth. Dev-side tooling for
adjudicating the big replay oracles at sf1.0, where the single-query
form exceeds the VM's memory+disk (DuckDB re-inlines multi-referenced
CTEs and keeps every pipeline's working set live at once; staged temp
tables bound the footprint to one stage at a time).

Usage: python3 tools/cte_stage_profile.py <verify_out_dir> <sf_dir> <query>
Env: DUCKDB_MEMORY_LIMIT, DUCKDB_TEMP_DIR (same as oracle_check.py)
"""
import json
import os
import sys
import time

import duckdb


def strip_comments(sql):
    """Drop `-- ...` line comments (outside string literals) — a
    comment's apostrophes and parens would corrupt the depth scan."""
    out = []
    for line in sql.split("\n"):
        i, in_str = 0, False
        while i < len(line):
            c = line[i]
            if c == "'":
                in_str = not in_str
            elif not in_str and c == "-" and line[i:i + 2] == "--":
                line = line[:i]
                break
            i += 1
        out.append(line)
    return "\n".join(out)


def split_ctes(sql):
    """Return ([(name, materialized, body), ...], final_select) from a
    'WITH [RECURSIVE] a AS (...), b(cols) AS MATERIALIZED (...) SELECT'
    query. Tracks paren depth; ignores commas inside bodies and nested
    WITHs inside expressions. A recursive member's name keeps its
    column list (e.g. 'reach(id, r)'); `materialized` records an
    'AS MATERIALIZED' hint so tail reconstruction can preserve it."""
    s = strip_comments(sql).strip()
    assert s.upper().startswith("WITH"), "not a WITH query"
    i = 4
    if s[i:].lstrip().upper().startswith("RECURSIVE"):
        i = s.upper().index("RECURSIVE", i) + len("RECURSIVE")
    ctes = []
    n = len(s)

    def skip_parens(k):
        """k at '('; return index past the matching ')'."""
        depth, m = 1, k + 1
        while depth:
            c = s[m]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "'":  # skip string literal
                m += 1
                while s[m] != "'":
                    m += 1
            m += 1
        return m

    while True:
        # parse:  name [(col, ...)] AS ( body )
        while s[i].isspace() or s[i] == ',':
            i += 1
        j = i
        while s[j] not in " \t\n(":
            j += 1
        name = s[i:j]
        k = s.index("(", j)
        between = s[j:k].strip().upper()
        if between == "":  # name directly followed by a column list
            m = skip_parens(k)
            name = s[i:m]  # keep 'name(col, ...)' as the declaration
            as_at = s.upper().index("AS", m)
            k = s.index("(", as_at + 2)
            between = s[as_at:k].strip().upper()
        m = skip_parens(k)
        ctes.append((name, "MATERIALIZED" in between, s[k + 1:m - 1]))
        i = m
        while i < n and s[i].isspace():
            i += 1
        if i < n and s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


def main(out_dir, sf_dir, query):
    con = duckdb.connect()
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    tmp = os.environ.get("DUCKDB_TEMP_DIR")
    if tmp:
        con.execute(f"SET temp_directory='{tmp}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[query]
    ctes, final = split_ctes(sql)

    def spill():
        if not tmp or not os.path.isdir(tmp):
            return 0
        return sum(os.path.getsize(os.path.join(tmp, f))
                   for f in os.listdir(tmp)) // (1 << 20)

    # stage until the first self-referencing (recursive) CTE; it and
    # everything after it run inside the final query, where the staged
    # temp tables bound what the recursion re-evaluates per iteration.
    # Self-reference = the name appears as a RELATION (after FROM or
    # JOIN) in its own body — a bare word-boundary match would false-
    # positive on a column alias like '... AS sh' in the sh CTE.
    import re as _re
    cut = len(ctes)
    for idx, (name, _, body) in enumerate(ctes):
        base = name.split("(")[0]
        if _re.search(rf"\b(FROM|JOIN)\s+{_re.escape(base)}\b", body,
                      _re.IGNORECASE):
            cut = idx
            break
    for name, _, body in ctes[:cut]:
        # temp-table staging IS materialization, so the hint is moot here
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
        rows = con.sql(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
        print(f"{name:10s} {time.time()-t0:8.1f}s {rows:>12,} rows "
              f"spill={spill()}MB", flush=True)
    if cut < len(ctes):
        # keep AS MATERIALIZED hints: dropping one from e.g. q62's
        # `edges` would re-inline the whole pipeline per recursion step
        tail = ",\n".join(
            f"{n} AS {'MATERIALIZED ' if mat else ''}({b})"
            for n, mat, b in ctes[cut:])
        final = f"WITH RECURSIVE {tail}\n{final}"
    t0 = time.time()
    exp_rel = con.sql(final)
    exp_names = [c.lower() for c in exp_rel.columns]
    exp = exp_rel.fetchall()
    print(f"{'FINAL':10s} {time.time()-t0:8.1f}s {len(exp):>12,} rows")
    # staged FINAL ≡ the oracle's result set (the CTE split is purely
    # operational), so compare it against the engine parquet with the
    # SAME normalization oracle_check.py uses (imported, not copied, so
    # the two adjudicators cannot drift) — this makes a staged run a
    # full adjudication when the monolithic form exceeds the VM.
    from oracle_check import rows_key

    got_rel = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/{query}/*.parquet')")
    got_names = [c.lower() for c in got_rel.columns]
    got = got_rel.fetchall()
    a, b = rows_key(got, got_names), rows_key(exp, exp_names)
    if sorted(got_names) != sorted(exp_names):
        print(f"FAIL {query}: columns {sorted(got_names)} != {sorted(exp_names)}")
    elif a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {query}: {len(a)} vs {len(b)} rows; first diffs: {diffs}")
    else:
        print(f"PASS {query} ({len(a)} rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
