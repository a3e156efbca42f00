#!/usr/bin/env python3
"""Realistic-vocabulary variant of a testdata dir: same tables, but
documents.text regenerated over a large Zipf vocabulary. Dev-side
tooling only (like scale_up.py) — exists because the driver corpus has
a 31-word vocabulary, so at sf1.0 its 3-gram space saturates (92% of
shingles exceed the dedup pipelines' df caps). That regime proves
cap-robustness under worst-case df skew but leaves the REALISTIC
regime — large Zipf vocabulary, thin over-cap head — untested at
scale. This generator provides that regime on the same schema/ids so
the engine and the replay oracles run unchanged.

Per source document (template): same doc_id/lang/source, token count
matching the template's whitespace token count, tokens drawn Zipf(s)
over `vocab` synthetic words ("w<rank>"), seeded per doc_id for
determinism. Every 50th doc is a planted near-duplicate of its
predecessor (drop 3 tokens, substitute 1) so the near-dup funnels have
genuine positives to find; all other pairs are unrelated draws.
n_chars is recomputed to LENGTH(text) (the invariant queries rely on).
Other tables are copied byte-for-byte from the source dir.

An optional replication `factor` tiles the template doc list N times
(doc_id offset 10M per copy — clear of every query-fixture synthetic
offset) before generating, for decade probes past the largest template
(the sf10 spot-sweep). Texts stay per-doc_id deterministic, so copies
are fresh Zipf draws, not near-duplicates of each other.

Usage: python3 tools/gen_zipf_docs.py <src> <dst> [vocab=12000] [s=1.07] [factor=1]
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen_texts(doc_ids, tok_counts, vocab, s):
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-s)
    probs /= probs.sum()
    words = np.array([f"w{r}" for r in range(1, vocab + 1)])
    texts = []
    prev_toks = None
    for i, (did, n) in enumerate(zip(doc_ids, tok_counts)):
        rng = np.random.default_rng(0xC0FFEE + int(did))
        if i % 50 == 49 and prev_toks is not None and len(prev_toks) > 6:
            # planted near-dup of the previous doc: drop 3, substitute 1
            toks = list(prev_toks)
            for _ in range(3):
                toks.pop(int(rng.integers(0, len(toks))))
            toks[int(rng.integers(0, len(toks)))] = str(
                words[int(rng.choice(vocab, p=probs))])
        else:
            toks = [str(w) for w in words[rng.choice(vocab, size=n, p=probs)]]
        prev_toks = toks
        texts.append(" ".join(toks))
    return texts


def main(src, dst, vocab=12000, s=1.07, factor=1):
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(f"{src}/{f}", f"{dst}/{f}")
    t = pq.read_table(f"{src}/documents.parquet")
    base_ids = t.column("doc_id").to_pylist()
    base_counts = [max(4, len(v.split(" "))) for v in
                   t.column("text").to_pylist()]
    copies = []
    for k in range(factor):
        doc_ids = [d + k * 10_000_000 for d in base_ids]
        texts = gen_texts(doc_ids, base_counts, vocab, s)
        cols = []
        for field in t.schema:
            if field.name == "doc_id":
                cols.append(pa.array(doc_ids, type=field.type))
            elif field.name == "text":
                cols.append(pa.array(texts, type=field.type))
            elif field.name == "n_chars":
                cols.append(pa.array([len(x) for x in texts],
                                     type=field.type))
            else:
                cols.append(t.column(field.name))
        copies.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/documents.parquet", version="2.6")
    texts = [v.as_py() for v in out.column("text").combine_chunks()]
    # regime report: shingle df head vs the dedup pipelines' caps
    import collections
    df = collections.Counter()
    for txt in texts:
        toks = txt.split(" ")
        seen = set()
        for j in range(len(toks) - 2):
            seen.add(" ".join(toks[j:j + 3]))
        for sh in seen:
            df[sh] += 1
    tot = len(df)
    over64 = sum(1 for v in df.values() if v > 64)
    print(f"docs={len(texts)} vocab={vocab} zipf_s={s} "
          f"distinct_3grams={tot} over_df64={over64} "
          f"({100.0 * over64 / tot:.2f}% of vocabulary over the q66 cap)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 12000,
         float(sys.argv[4]) if len(sys.argv) > 4 else 1.07,
         int(sys.argv[5]) if len(sys.argv) > 5 else 1)
