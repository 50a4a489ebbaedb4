import numpy as np, time
import bench as B
from vettore_tpu.index.hnsw import HnswIndex
from vettore_tpu.index.flat import FlatIndex

n, d = 100_000, 768
data = B.clustered_corpus(n, d)
ids = [f"doc-{i:07d}" for i in range(n)]
queries = B.make_queries(data, 512)
flat = FlatIndex("cosine"); flat.put_many(zip(ids, data))
truth = flat.search_batch(queries, 10)
print(f"[{time.strftime('%H:%M:%S')}] truth done", flush=True)
hnsw = HnswIndex("cosine", {**B.HNSW_PARAMS, "ef_search": 64})
hnsw.BULK_THRESHOLD = 20000
t0 = time.perf_counter(); hnsw.put_many(zip(ids, data))
print(f"[{time.strftime('%H:%M:%S')}] build {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter(); hits = hnsw.search_batch(queries, 10)
t1 = time.perf_counter(); hits = hnsw.search_batch(queries, 10)
t2 = time.perf_counter()
r = B.recall_at_k(hits, truth)
print(f"[wide] search512 first {t1-t0:.0f}s warm {(t2-t1)*1e3:.0f}ms -> {512/(t2-t1):,.0f} QPS recall {r:.3f}", flush=True)
