"""Sweep the beam expansion width W (and ef) on the cached 1M graph:
wider expansion cuts sequential iteration count (the fixed-cost term) at
the same total gather traffic. Measures warm ms/batch + recall@10."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import (HNSW_PARAMS, cached_corpus, graph_cache_name, make_queries,
                   overlap_at_k, _cache_path)

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    from vettore_tpu.index.flat import FlatIndex
    from vettore_tpu.index import hnsw_device
    from vettore_tpu.index.hnsw import HnswIndex
    from vettore_tpu.ops.transport import fetch_barrier

    N, D, B = 1_000_000, 768, 512
    phase("corpus")
    data = cached_corpus(N, D)
    queries = make_queries(data, 2 * B)
    ids = [f"doc-{i:07d}" for i in range(N)]

    phase("flat ingest")
    flat = FlatIndex("cosine")
    flat.put_matrix(ids, data)
    flat._sync_device()
    fetch_barrier(flat._device[0])
    phase("ground truth")
    truth = flat.search_batch(queries[:B], 10)

    phase("graph load")
    gp = _cache_path(graph_cache_name(N, D))
    with np.load(gp, allow_pickle=False) as z:
        graph_ids = [str(i) for i in z["ids"]]
    perm = np.fromiter((flat._slot_of[i] for i in graph_ids), dtype=np.int32,
                       count=len(graph_ids))
    x_dev = flat._device[0][jnp.asarray(perm)]
    hnsw = HnswIndex.load_graph("cosine", {**HNSW_PARAMS, "ef_search": 16},
                                gp, x_device=x_dev)
    hnsw._device = hnsw._bulk
    hnsw._device_version = hnsw._version
    graph = hnsw._device
    fetch_barrier(graph.a0)

    qdev = jnp.asarray(queries.astype(np.float32))
    xb = graph.xb
    hub_slots, hub_x = graph.hubs(jnp.bfloat16)
    valid = getattr(graph, "valid", None)
    hub_valid = graph.hub_validity() if valid is not None else None

    def run(ef, w, msteps):
        def dispatch(i):
            s = (i * 37) % (qdev.shape[0] - B)
            return hnsw_device._search_kernel(
                graph.x, graph.a0, graph.up_index, graph.up_adj,
                graph.lex_rank, graph.entry_slot, graph.entry_level,
                jax.lax.dynamic_slice_in_dim(qdev, s, B),
                metric=graph.metric, lmax=graph.lmax, ef=ef, limit=10,
                max_steps=msteps, xb=xb, hub_slots=hub_slots, hub_x=hub_x,
                hub_valid=hub_valid, valid=valid, expand_w=w)
        ids_out, raws, _d = dispatch(0)
        fetch_barrier(ids_out)
        hits = [
            [(graph.ids[s], float(r)) for s, r in zip(row_i, row_r) if s >= 0]
            for row_i, row_r in zip(np.asarray(ids_out), np.asarray(raws))
        ]
        rec = overlap_at_k(hits, truth)
        t0 = time.perf_counter()
        for i in range(6):
            out = dispatch(i)
        fetch_barrier(out[0])
        dt = (time.perf_counter() - t0) / 6
        phase(f"ef={ef:3d} W={w:3d} steps<={msteps:3d}: "
              f"{dt * 1000:6.1f} ms/batch ({B / dt:7.0f} qps)  recall@10={rec:.4f}")

    for ef, w in ((16, 8), (16, 16), (24, 24), (32, 32), (16, 4)):
        msteps = hnsw_device.step_bound(ef, w)
        run(ef, w, msteps)


if __name__ == "__main__":
    main()
