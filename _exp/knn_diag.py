"""Diagnose kNN-build recall: edge recall (are true neighbors in a0?) vs
search recall (does the beam reach them?), on bench-like clustered geometry.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
centers = max(10, n // 100)

rng = np.random.default_rng(0)
c = rng.normal(size=(centers, d)).astype(np.float32)
c /= np.linalg.norm(c, axis=1, keepdims=True)
assign = rng.integers(0, centers, n)
data = c[assign] + (0.4 / np.sqrt(d)) * rng.normal(size=(n, d)).astype(np.float32)
data /= np.linalg.norm(data, axis=1, keepdims=True)
ids = [f"doc-{i:07d}" for i in range(n)]

from vettore_tpu.index.hnsw import HnswIndex

t0 = time.time()
idx = HnswIndex("cosine", {"m": 16, "m0": 32, "ef_construction": 100,
                           "ef_search": 16, "build": "knn"})
idx.BULK_THRESHOLD = 2
idx.put_many(zip(ids, data))
print("build_s", round(time.time() - t0, 1), flush=True)

g = idx._bulk
a0 = np.asarray(g.a0)
slot_vecs = np.asarray(g.x)

# ---- edge recall: for sampled slots, is the true top-m0 present in a0?
sample = rng.integers(0, n, 256)
sims = slot_vecs[sample] @ slot_vecs.T
er10 = []
for i, s in enumerate(sample):
    order = np.argsort(-sims[i])
    true10 = [j for j in order[:11] if j != s][:10]
    er10.append(len(set(true10) & set(a0[s].tolist())) / 10)
print("edge recall@10 (true top-10 present in a0 row):",
      round(float(np.mean(er10)), 4))

# ---- search recall at ef sweep
q = data[rng.integers(0, n, 256)] + (0.4 / np.sqrt(d)) * rng.normal(
    size=(256, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
gt = np.argsort(-(q @ data.T), axis=1)[:, :10]
want = [{ids[j] for j in row} for row in gt]
for ef in (16, 64, 256):
    idx.params["ef_search"] = ef
    hits = idx.search_batch(q.astype(np.float64), 10)
    rec = np.mean([len({h[0] for h in row} & want[i]) / 10
                   for i, row in enumerate(hits)])
    print(f"ef={ef}: search recall@10 {rec:.4f}", flush=True)

# ---- candidate-pool recall by cluster congruence: fraction of true top-10
# in the same kmeans-block neighborhood is approximated by edge recall above;
# also check how many true neighbors share the natural cluster
same = []
for i, s in enumerate(sample):
    order = np.argsort(-sims[i])
    true10 = [j for j in order[:11] if j != s][:10]
    same.append(np.mean([assign[j] == assign[s] for j in true10]))
print("fraction of true top-10 in same natural cluster:",
      round(float(np.mean(same)), 4))
