"""Diagnose the 1M quantized/funnel path phase by phase (bench r3 lost its
adaptive phases to a ~480 s stall after 'cpu baseline')."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import cached_corpus, make_queries

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    from vettore_tpu.collection import Collection
    from vettore_tpu.ops.transport import fetch_barrier

    N, D, B = 1_000_000, 768, 512
    phase("corpus")
    data = cached_corpus(N, D)
    queries = make_queries(data, 2 * B)
    ids = [f"doc-{i:07d}" for i in range(N)]

    phase("put_matrix")
    col = Collection(name="q", dimensions=D, metric="cosine", index="flat")
    col.put_matrix(ids, data)

    phase("scan cache build (host)")
    cache = col._scan_cache()
    phase("cache.vectors upload")
    x, valid = cache.vectors()
    fetch_barrier(x)
    phase("cache.bits (host pack + upload)")
    bits = cache.bits()
    fetch_barrier(bits)
    phase("cache.signs (device expand)")
    signs = cache.signs()
    fetch_barrier(signs)

    phase("quantized batch: first dispatch (compile)")
    qh = col.quantized_search_batch(queries[:B], limit=10, candidates=500)
    phase(f"first done (top: {qh[0][0].id})")
    t0 = time.perf_counter()
    for i in range(4):
        col.quantized_search_batch(queries[(i % 2) * B : (i % 2) * B + B],
                                   limit=10, candidates=500)
    dt = (time.perf_counter() - t0) / 4
    phase(f"quantized warm: {dt * 1000:.1f} ms/batch ({B / dt:.0f} qps)")

    phase("funnel batch: first dispatch (compile)")
    fh = col.funnel_search_batch(queries[:B], limit=10, candidates=200,
                                 stages=[128, 256, 384])
    phase(f"first done (top: {fh[0][0].id})")
    t0 = time.perf_counter()
    for i in range(4):
        col.funnel_search_batch(queries[(i % 2) * B : (i % 2) * B + B],
                                limit=10, candidates=200, stages=[128, 256, 384])
    dt = (time.perf_counter() - t0) / 4
    phase(f"funnel warm: {dt * 1000:.1f} ms/batch ({B / dt:.0f} qps)")


if __name__ == "__main__":
    main()
