#!/usr/bin/env python3
"""Chunked adjudicator for the WHOLE text-dedup funnel at the 500k-doc
zipf10 decade: stages the q21 minhash replay once (sigv chunked by
permutation index, exactly like chunked_minhash_oracle.py) through the
verified-pairs table `vp`, then adjudicates any of:

  q21_dedup_minhash  — vp itself (same check as chunked_minhash_oracle)
  q67_text_knn       — top-k ranking over vp's (pair, jaccard) edges.
                       The sf-scale oracle builds pairs by the exact
                       all-pairs inverted index, which is Sigma(df^2)-
                       infeasible on the Zipf corpus; the engine's own
                       contract is knn over the LSH-verified pairs, and
                       vp is pinned pair-for-pair by the q21 gate, so
                       ranking over vp adjudicates exactly what the
                       engine computes (the q62 replay-oracle precedent
                       from round 7).
  q62_cluster_assign — connected components over vp + exact-copy
                       membership edges. The sf-scale oracle's recursive
                       min-reachable CTE materializes Sigma(cluster^2)
                       rows — quadratic in the Zipf corpus' big clusters
                       — so components run here as min-label propagation
                       with pointer jumping (label := label of label),
                       a Python-driven loop over O(E)-per-round temp
                       tables that converges in O(log n) rounds. Both
                       are the unique min-reachable-id labeling, so the
                       results are identical by definition.

Every final comparison reuses oracle_check.rows_key, so this
adjudicator cannot drift from the driver's hash gate.

Usage: python3 tools/chunked_funnel_oracle.py <verify_out_dir> <sf_dir> <query...> [--chunks=N]
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

KNOWN = ("q21_dedup_minhash", "q67_text_knn", "q62_cluster_assign",
         "q22_dedup_simhash", "q66_containment_pairs",
         "q88_chunk_dedup", "q94_substring_scrub")

# queries that ride the shared q21 minhash replay (one staging, many
# adjudications); q22/q66 have their own pipelines and stage into their
# own connections (their CTE names collide with the q21 replay's)
MINHASH_FAMILY = ("q21_dedup_minhash", "q67_text_knn", "q62_cluster_assign")


def log(msg):
    print(msg, flush=True)


def stage_replay(con, out_dir, chunks):
    """Materialize every q21 replay CTE through `vp` as temp tables,
    chunking the shingles x permutations cross join by permutation
    index (i % chunks = k partitions sigv's (doc_id, i) groups, so the
    split is exactly equivalent to the monolith).
    """
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)["q21_dedup_minhash"]
    ctes, _final = split_ctes(sql)
    names = [n for n, _, _ in ctes]
    assert "sigv" in names and "vp" in names, f"replay shape changed: {names}"
    cut = names.index("sigv")

    def spill():
        d = os.environ.get("DUCKDB_TEMP_DIR")
        if not d or not os.path.isdir(d):
            return 0
        return sum(os.path.getsize(os.path.join(d, f))
                   for f in os.listdir(d)) // (1 << 20)

    for n, _, b in ctes[:cut]:
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE {n} AS {b}")
        rows = con.sql(f"SELECT COUNT(*) FROM {n}").fetchone()[0]
        log(f"{n:10s} {time.time()-t0:8.1f}s {rows:>12,} rows spill={spill()}MB")

    sig_body = ctes[cut][2]
    anchor = "CROSS JOIN perm p"
    assert anchor in sig_body, "sigv stage shape changed; update the chunker"
    for k in range(chunks):
        t0 = time.time()
        body = sig_body.replace(
            anchor, f"CROSS JOIN (SELECT * FROM perm WHERE i % {chunks} = {k}) p")
        con.execute(f"CREATE TEMP TABLE sigv_{k} AS {body}")
        rows = con.sql(f"SELECT COUNT(*) FROM sigv_{k}").fetchone()[0]
        log(f"sigv[{k}/{chunks}] {time.time()-t0:6.1f}s {rows:>12,} rows "
            f"spill={spill()}MB")
    con.execute("CREATE TEMP TABLE sigv AS " + " UNION ALL ".join(
        f"SELECT * FROM sigv_{k}" for k in range(chunks)))
    for k in range(chunks):
        con.execute(f"DROP TABLE sigv_{k}")

    for n, _, b in ctes[cut + 1:]:
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE {n} AS {b}")
        rows = con.sql(f"SELECT COUNT(*) FROM {n}").fetchone()[0]
        log(f"{n:10s} {time.time()-t0:8.1f}s {rows:>12,} rows spill={spill()}MB")


def compare(con, out_dir, query, sql, names_hint=None):
    t0 = time.time()
    exp_rel = con.sql(sql)
    exp_names = [c.lower() for c in exp_rel.columns]
    exp = exp_rel.fetchall()
    log(f"{'FINAL':10s} {time.time()-t0:8.1f}s {len(exp):>12,} rows")
    got_rel = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/{query}/*.parquet')")
    got_names = [c.lower() for c in got_rel.columns]
    got = got_rel.fetchall()
    if sorted(got_names) != sorted(exp_names):
        log(f"FAIL {query}: columns {sorted(got_names)} != {sorted(exp_names)}")
        return False
    a, b = rows_key(got, got_names), rows_key(exp, exp_names)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        log(f"FAIL {query}: {len(a)} vs {len(b)} rows; first diffs: {diffs}")
        return False
    log(f"PASS {query} ({len(a)} rows)")
    return True


def adjudicate_q21(con, out_dir):
    return compare(con, out_dir, "q21_dedup_minhash",
                   "SELECT id_a, id_b, jaccard FROM vp ORDER BY id_a, id_b")


def adjudicate_q67(con, out_dir):
    # knnFromPairs over the pinned vp edges: symmetric expansion, rank
    # by (rounded jaccard DESC, neighbor_id), k = 3 — the engine's exact
    # tail (ExtensionQueries.textKnn)
    sql = """
      WITH sym AS (
        SELECT id_a AS doc_id, id_b AS neighbor_id, jaccard AS j FROM vp
        UNION ALL
        SELECT id_b, id_a, jaccard FROM vp
      ),
      rk AS (
        SELECT doc_id, neighbor_id, j,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY j DESC, neighbor_id) AS rnk
        FROM sym
      )
      SELECT doc_id, neighbor_id, j AS jaccard, CAST(rnk AS INTEGER) AS rank
      FROM rk WHERE rnk <= 3 ORDER BY doc_id, rank"""
    return compare(con, out_dir, "q67_text_knn", sql)


def adjudicate_q62(con, out_dir, max_rounds=50):
    # exact-copy membership edges (rep = min doc_id per text), then
    # min-label propagation + pointer jumping over vp + mem
    t0 = time.time()
    con.execute("""
      CREATE TEMP TABLE edges AS
      WITH mem AS (
        SELECT r.rep AS id_a, c.doc_id AS id_b
        FROM corpus0 c
        JOIN (SELECT text, MIN(doc_id) AS rep FROM corpus0 GROUP BY text) r
          USING (text)
        WHERE c.doc_id <> r.rep
      )
      SELECT id_a AS s, id_b AS d FROM vp
      UNION SELECT id_b, id_a FROM vp
      UNION SELECT id_a, id_b FROM mem
      UNION SELECT id_b, id_a FROM mem""")
    e = con.sql("SELECT COUNT(*) FROM edges").fetchone()[0]
    log(f"{'edges':10s} {time.time()-t0:8.1f}s {e:>12,} rows")
    con.execute("CREATE TEMP TABLE lbl AS SELECT doc_id, doc_id AS l FROM corpus0")
    for rnd in range(max_rounds):
        t0 = time.time()
        # one propagation step: label := min over self and neighbors...
        con.execute("""
          CREATE TEMP TABLE lbl_p AS
          SELECT doc_id, MIN(l) AS l FROM (
            SELECT doc_id, l FROM lbl
            UNION ALL
            SELECT e.s AS doc_id, lbl.l FROM edges e JOIN lbl ON lbl.doc_id = e.d
          ) GROUP BY doc_id""")
        # ...then pointer jumping: label := label's label (labels are
        # doc_ids, so this halves the remaining distance to the root)
        con.execute("""
          CREATE TEMP TABLE lbl_j AS
          SELECT a.doc_id, LEAST(a.l, b.l) AS l
          FROM lbl_p a JOIN lbl_p b ON b.doc_id = a.l""")
        changed = con.sql("""
          SELECT COUNT(*) FROM lbl_j n JOIN lbl o USING (doc_id)
          WHERE n.l <> o.l""").fetchone()[0]
        con.execute("DROP TABLE lbl"); con.execute("ALTER TABLE lbl_j RENAME TO lbl")
        con.execute("DROP TABLE lbl_p")
        log(f"cc[{rnd}] {time.time()-t0:8.1f}s changed={changed:,}")
        if changed == 0:
            break
    else:
        log("FAIL q62_cluster_assign: label propagation did not converge")
        return False
    sql = """
      WITH cc AS (SELECT doc_id, l AS cluster_id FROM lbl)
      SELECT cc.doc_id, cc.cluster_id, sz.cluster_size
      FROM cc
      JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1) sz
        USING (cluster_id)
      ORDER BY cc.doc_id"""
    return compare(con, out_dir, "q62_cluster_assign", sql)


def fresh_con(sf_dir):
    con = duckdb.connect()
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def stage_logged(con, name, body):
    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE {name} AS {body}")
    rows = con.sql(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
    log(f"{name:10s} {time.time()-t0:8.1f}s {rows:>12,} rows")
    return rows


def adjudicate_q22(out_dir, sf_dir, chunks):
    """SimHash pigeonhole replay, staged. The one stage that does not
    fit monolithically at the 1M-doc decade is `bits` — the per-token
    hash rows cross-joined with 64 bit positions (52.6M x 64 = 3.4B
    intermediate rows). Chunking the bit axis (bit % chunks = k) is
    exactly equivalent: each (doc_id, bit) tally group lives entirely
    inside one chunk, and the union of chunk outputs IS `bits`.
    """
    con = fresh_con(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)["q22_dedup_simhash"]
    ctes, final = split_ctes(sql)
    names = [n for n, _, _ in ctes]
    assert "bits" in names, f"q22 replay shape changed: {names}"
    cut = names.index("bits")
    for n, _, b in ctes[:cut]:
        stage_logged(con, n, b)
    bits_body = ctes[cut][2]
    anchor = "(SELECT UNNEST(range(0, 64)) AS bit) b"
    assert anchor in bits_body, "q22 bits stage shape changed; update the chunker"
    for k in range(chunks):
        body = bits_body.replace(
            anchor,
            f"(SELECT bit FROM (SELECT UNNEST(range(0, 64)) AS bit) "
            f"WHERE bit % {chunks} = {k}) b")
        stage_logged(con, f"bits_{k}", body)
    con.execute("CREATE TEMP TABLE bits AS " + " UNION ALL ".join(
        f"SELECT * FROM bits_{k}" for k in range(chunks)))
    for k in range(chunks):
        con.execute(f"DROP TABLE bits_{k}")
    for n, _, b in ctes[cut + 1:]:
        stage_logged(con, n, b)
    return compare(con, out_dir, "q22_dedup_simhash", final)


def adjudicate_q66(out_dir, sf_dir, chunks):
    """Capped containment-index replay, staged. The heavy stage is the
    inverted-index self-join `shared` (cost Sigma(df^2), df <= 64 by the
    replayed cap); it chunks by shingle hash — shingles partition
    across chunks, so per-pair partial intersection counts SUM to the
    monolith's counts exactly.
    """
    con = fresh_con(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)["q66_containment_pairs"]
    ctes, final = split_ctes(sql)
    names = [n for n, _, _ in ctes]
    assert "shared" in names and "dfs" in names and \
        names.index("dfs") < names.index("shared"), \
        f"q66 replay shape changed: {names}"
    cut = names.index("shared")
    for n, _, b in ctes[:cut]:
        stage_logged(con, n, b)
    # feasibility probe: the self-join materializes Sigma(df^2) rows
    # (NULL when nothing survives the cap — an empty but valid replay)
    sdf2 = con.sql(
        "SELECT COALESCE(SUM(df * df), 0) FROM dfs WHERE df <= 64").fetchone()[0]
    log(f"{'probe':10s} capped sum(df^2) = {sdf2:,}")
    shared_body = ctes[cut][2]
    anchor = "FROM ex a JOIN ex b ON a.g = b.g"
    assert anchor in shared_body, "q66 shared stage shape changed; update the chunker"
    for k in range(chunks):
        body = shared_body.replace(
            anchor,
            f"FROM (SELECT * FROM ex WHERE hash(g) % {chunks} = {k}) a "
            f"JOIN (SELECT * FROM ex WHERE hash(g) % {chunks} = {k}) b "
            "ON a.g = b.g")
        stage_logged(con, f"shared_{k}", body)
    con.execute(
        "CREATE TEMP TABLE shared AS SELECT id_a, id_b, "
        "CAST(SUM(inter) AS BIGINT) AS inter FROM (" +
        " UNION ALL ".join(f"SELECT * FROM shared_{k}" for k in range(chunks)) +
        ") GROUP BY id_a, id_b")
    for k in range(chunks):
        con.execute(f"DROP TABLE shared_{k}")
    for n, _, b in ctes[cut + 1:]:
        stage_logged(con, n, b)
    return compare(con, out_dir, "q66_containment_pairs", final)


def adjudicate_staged(out_dir, sf_dir, query):
    """Text-pass replays (q88 fixed-chunk boilerplate, q94 sliding-
    window scrub) staged CTE-by-CTE in their own connection: the heavy
    stages (6.6M chunk strings / 52.6M window strings at the 1M-doc
    decade) fit a bounded-memory temp table directly — staging exists
    so each gets its own spill budget and a per-stage profile line, and
    so a future decade can chunk the window stage by hash without
    changing the call shape.
    """
    con = fresh_con(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[query]
    ctes, final = split_ctes(sql)
    for n, _, b in ctes:
        stage_logged(con, n, b)
    return compare(con, out_dir, query, final)


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    out_dir, sf_dir, queries = args[0], args[1], args[2:]
    chunks = 16
    for a in argv:
        if a.startswith("--chunks="):
            chunks = int(a.split("=", 1)[1])
    assert queries and all(q in KNOWN for q in queries), f"queries from {KNOWN}"
    ok = True
    if any(q in MINHASH_FAMILY for q in queries):
        con = fresh_con(sf_dir)
        stage_replay(con, out_dir, chunks)
        for q in queries:
            if q == "q21_dedup_minhash":
                ok &= adjudicate_q21(con, out_dir)
            elif q == "q67_text_knn":
                ok &= adjudicate_q67(con, out_dir)
            elif q == "q62_cluster_assign":
                ok &= adjudicate_q62(con, out_dir)
        con.close()
    if "q22_dedup_simhash" in queries:
        ok &= adjudicate_q22(out_dir, sf_dir, chunks)
    if "q66_containment_pairs" in queries:
        ok &= adjudicate_q66(out_dir, sf_dir, chunks)
    for q in ("q88_chunk_dedup", "q94_substring_scrub"):
        if q in queries:
            ok &= adjudicate_staged(out_dir, sf_dir, q)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
