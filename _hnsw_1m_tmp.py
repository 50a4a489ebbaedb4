import numpy as np, time, sys
import bench as B
from vettore_tpu.index.hnsw import HnswIndex
import jax, jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
d = 768
data = B.clustered_corpus(n, d)
ids = [f"doc-{i:07d}" for i in range(n)]
queries = B.make_queries(data, 32)
print(f"[{time.strftime('%H:%M:%S')}] corpus done", flush=True)

hnsw = HnswIndex("cosine", {**B.HNSW_PARAMS, "ef_search": 64})
hnsw.BULK_THRESHOLD = 20000
t0 = time.perf_counter()
hnsw.put_many(zip(ids, data))
print(f"[{time.strftime('%H:%M:%S')}] build {time.perf_counter()-t0:.0f}s", flush=True)

for bq in (2, 8, 32):
    t0 = time.perf_counter()
    hits = hnsw.search_batch(queries[:bq], 10)
    print(f"[{time.strftime('%H:%M:%S')}] search B={bq}: {time.perf_counter()-t0:.1f}s top={hits[0][0][0]}", flush=True)
