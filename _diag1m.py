import numpy as np, time
import bench as B
from vettore_tpu.index.hnsw import HnswIndex
from vettore_tpu.index import hnsw_device
import jax, jax.numpy as jnp

n, d = 1_000_000, 768
data = B.clustered_corpus(n, d)
ids = [f"doc-{i:07d}" for i in range(n)]
queries = B.make_queries(data, 128)
print(f"[{time.strftime('%H:%M:%S')}] corpus", flush=True)
hnsw = HnswIndex("cosine", {**B.HNSW_PARAMS, "ef_search": 64})
hnsw.put_many(zip(ids, data))
print(f"[{time.strftime('%H:%M:%S')}] built", flush=True)
g = hnsw._bulk
print("lmax:", g.lmax, "n:", g.n, "cap_up:", np.asarray(g.up_adj).shape, flush=True)

# tiny batch first with small max_steps to cap runtime
for B_, ms in ((8, 2000), (8, 100000), (128, 2000)):
    q = jnp.asarray(queries[:B_], jnp.float32)
    t0 = time.perf_counter()
    ids_, raws_, dists_ = jax.device_get(hnsw_device._search_kernel(
        g.x, g.a0, g.up_index, g.up_adj, g.lex_rank, g.entry_slot, g.entry_level, q,
        metric="cosine", lmax=g.lmax, ef=64, limit=10, max_steps=ms))
    print(f"[{time.strftime('%H:%M:%S')}] B={B_} ms={ms}: {time.perf_counter()-t0:.1f}s top={ids_[0][:2]}", flush=True)
