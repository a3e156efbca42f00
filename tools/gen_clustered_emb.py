#!/usr/bin/env python3
"""Deterministic mixture-of-Gaussians embedding fixture for RecallBench.

The driver-generated testdata embeddings are i.i.d. noise, where recall
is set by the PQ quantizer and mildly FALLS with nprobe (BASELINE.md,
round 14) — a curve that cannot guide an nprobe choice. Real embedding
corpora are clustered; this generator produces that shape so the
recall-vs-nprobe curve becomes the standard rising one a user tunes
against.

Layout: `n_centers` Gaussian cluster centers drawn on the unit sphere
(n_centers >> any sensible nlist, so IVF cells contain several true
clusters), each vector = its center + sigma * N(0, I/dim). `sigma` is
swept across output dirs: small sigma = tight clusters (near neighbors
are intra-cluster, coarse probing matters), large sigma degrades toward
the i.i.d. fixture.

Writes `<out>/sigma<σ>/embeddings.parquet` with the exact testdata
schema (vec_id BIGINT, embedding FLOAT[], label INT = cluster id), so
`graft.tools.RecallBench <out>/sigma<σ>` runs unchanged.

Usage: python3 tools/gen_clustered_emb.py [out_root] [n_vec] [dim]
Defaults: /root/clustered_emb 20000 64, sigmas 0.1 0.25 0.5.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/clustered_emb"
N_VEC = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
N_CENTERS = 256  # >> nlist=32: each IVF cell holds ~8 true clusters
SIGMAS = [0.1, 0.25, 0.5]

rng = np.random.default_rng(20260816)
centers = rng.standard_normal((N_CENTERS, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, N_CENTERS, size=N_VEC)
noise = rng.standard_normal((N_VEC, DIM)) / np.sqrt(DIM)

def write(vecs, lab, d):
    import os
    os.makedirs(d, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int32)),
    })
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    print(f"wrote {d}/embeddings.parquet  n={len(vecs)} dim={vecs.shape[1]}")


for sigma in SIGMAS:
    write(centers[labels] + sigma * noise, labels, f"{OUT}/sigma{sigma}")

# Low-rank manifold fixture: N_VEC points from a rank-8 Gaussian
# embedded in DIM dims. Finding (round 15): the DISCRETE mixture above
# yields recall FLAT in nprobe at every sigma — each well-separated
# cluster is assigned wholly to one IVF cell, so a query's true
# neighbors are always in its own cell and probing more never helps;
# what makes recall rise with nprobe is a CONTINUOUS neighborhood
# structure, where k-means cell boundaries cut through neighborhoods
# and a boundary query's true top-10 straddle adjacent cells. Real
# embedding corpora have exactly that (low effective rank, continuum),
# so this fixture is the one the nprobe guidance is read from.
RANK = 8
basis = rng.standard_normal((RANK, DIM)) / np.sqrt(RANK)
latent = rng.standard_normal((N_VEC, RANK))
write(latent @ basis + 0.02 * noise, np.zeros(N_VEC), f"{OUT}/lowrank")
