"""CPU smoke of the kNN bulk build: recall, invariants, determinism."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vettore_tpu.index.hnsw import HnswIndex

OPTS = {"m": 8, "m0": 16, "ef_construction": 48, "ef_search": 64,
        "build": "knn"}


def main():
    n, d = int(sys.argv[1]) if len(sys.argv) > 1 else 3000, 32
    rng = np.random.default_rng(0)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    ids = [f"id-{i:05d}" for i in range(n)]
    idx = HnswIndex("cosine", OPTS)
    idx.BULK_THRESHOLD = 2
    t0 = time.time()
    idx.put_many(zip(ids, data))
    print("build_s", round(time.time() - t0, 2), flush=True)

    q = data[:256] + 0.05 * rng.normal(size=(256, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gt = np.argsort(-(q @ data.T), axis=1)[:, :10]
    t0 = time.time()
    hits = idx.search_batch(q.astype(np.float64), 10)
    print("search_s", round(time.time() - t0, 2))
    rec = np.mean([
        len({h[0] for h in row} & {ids[j] for j in gt[i]}) / 10
        for i, row in enumerate(hits)
    ])
    print("recall@10", round(float(rec), 4))

    a0 = np.asarray(idx._bulk.a0)
    for i in range(n):
        row = a0[i][a0[i] >= 0]
        assert len(set(row.tolist())) == len(row), f"dup edge at {i}"
        assert i not in row.tolist(), f"self edge at {i}"
        assert (row < n).all()
    print("edges ok; mean deg", round(float((a0 >= 0).sum(1).mean()), 1))

    idx2 = HnswIndex("cosine", OPTS)
    idx2.BULK_THRESHOLD = 2
    idx2.put_many(zip(ids, data))
    assert (np.asarray(idx2._bulk.a0) == a0).all(), "nondeterministic"
    print("deterministic ok")


if __name__ == "__main__":
    main()
