import numpy as np, time
from vettore_tpu.index.hnsw import HnswIndex
from vettore_tpu.index.flat import FlatIndex
rng = np.random.default_rng(0)
n, d, nc = 20000, 96, 200
centers = rng.normal(size=(nc, d)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
sigma = 0.4/np.sqrt(d)
data = centers[rng.integers(0, nc, n)] + sigma*rng.normal(size=(n, d)).astype(np.float32)
data /= np.linalg.norm(data, axis=1, keepdims=True)
ids = [f"doc-{i:05d}" for i in range(n)]
qn = 0.2/np.sqrt(d)
qs = data[rng.integers(0, n, 32)] + qn*rng.normal(size=(32, d)).astype(np.float32)
flat = FlatIndex("cosine"); flat.put_many(zip(ids, data))
truth = flat.search_batch(qs, 10)

for name, thresh in [("bulk", 1000), ("incremental", 10**9)]:
    idx = HnswIndex("cosine")
    idx.BULK_THRESHOLD = thresh
    t0 = time.perf_counter()
    idx.put_many(zip(ids, data))
    bt = time.perf_counter()-t0
    for efs in (64, 256):
        idx.params["ef_search"] = efs
        hits = idx.search_batch(qs, 10)
        r = np.mean([len({i for i,_ in hh} & {i for i,_ in tt})/10 for tt, hh in zip(truth, hits)])
        print(f"{name} build {bt:.0f}s efs={efs}: recall@10 {r:.3f}", flush=True)
