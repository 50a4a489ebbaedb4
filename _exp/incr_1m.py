"""On-chip check: incremental put/delete on the cached 1M bulk graph.

Verdict r2 item 6's done-criterion: put/delete after a 1M bulk build in <1 s
(steady state; the first mutation pays a one-time migration + kernel
compile, reported separately)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from bench import CACHE_DIR, HNSW_PARAMS, cached_corpus, graph_cache_name
from vettore_tpu.index.hnsw import HnswIndex
from vettore_tpu.ops.transport import fetch_barrier

N, D = 1_000_000, 768
path = os.path.join(CACHE_DIR, graph_cache_name(N, D))
print("loading corpus + graph...", flush=True)
data = cached_corpus(N, D)
t0 = time.perf_counter()
idx = HnswIndex.load_graph("cosine", {**HNSW_PARAMS, "ef_search": 64}, path)
fetch_barrier(idx._bulk.a0)
print(f"graph loaded in {time.perf_counter() - t0:.1f}s; n={idx._bulk.n}", flush=True)

rng = np.random.default_rng(77)
new = rng.standard_normal((40, D)).astype(np.float32)
new /= np.linalg.norm(new, axis=1, keepdims=True)

# first put: migration + compile (one-time)
t0 = time.perf_counter()
idx.put("incr-00000", new[0])
fetch_barrier(idx._bulk.a0)
print(f"first put (migration+compile): {time.perf_counter() - t0:.1f}s", flush=True)

lat = []
for i in range(1, 20):
    t0 = time.perf_counter()
    idx.put(f"incr-{i:05d}", new[i])
    fetch_barrier(idx._bulk.a0)
    lat.append(time.perf_counter() - t0)
print(f"steady-state put: p50={np.percentile(lat, 50):.3f}s "
      f"max={max(lat):.3f}s", flush=True)

t0 = time.perf_counter()
idx.put_many((f"incr-b{i:05d}", v) for i, v in enumerate(new[20:]))
fetch_barrier(idx._bulk.a0)
print(f"batch put (20 rows): {time.perf_counter() - t0:.3f}s", flush=True)

lat = []
for i in range(5):
    t0 = time.perf_counter()
    idx.delete(f"incr-{i:05d}")
    fetch_barrier(idx._bulk.valid)
    lat.append(time.perf_counter() - t0)
print(f"delete: p50={np.percentile(lat, 50):.3f}s max={max(lat):.3f}s", flush=True)

# correctness: new ids findable, deleted ids absent
hits = idx.search_batch(new[5:10], 3)
got = [h[0][0] for h in hits]
want = [f"incr-{i:05d}" for i in range(5, 10)]
print("self-recall on live inserts:", got == want, got[:3], flush=True)
hits = idx.search_batch(new[0:5], 5)
dead = [f"incr-{i:05d}" for i in range(5)]
leak = any(d in [h[0] for h in row] for d, row in zip(dead, hits))
print("deleted ids leaked:", leak, flush=True)
assert got == want and not leak
print("OK", flush=True)
