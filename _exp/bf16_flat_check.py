"""Regression check: bf16 storage_view search at 1M (the round-3 bench hang —
group_topk's gsel-boundary tie check flagged ok=False on bf16 ties and sent
whole batches to the host oracle)."""
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
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    from vettore_tpu.index.flat import FlatIndex
    from vettore_tpu.ops import flat_scan
    from vettore_tpu.ops.transport import fetch_barrier

    N, D, B = 1_000_000, 768, 512
    phase("corpus")
    data = cached_corpus(N, D)
    queries = make_queries(data, 2 * B)
    ids = [f"doc-{i:07d}" for i in range(N)]

    phase("flat ingest + upload")
    flat = FlatIndex("cosine")
    flat.put_matrix(ids, data)
    flat._sync_device()
    fetch_barrier(flat._device[0])

    flat16 = flat.storage_view("bf16")
    qdev = jnp.asarray(queries.astype(np.float32))

    for name, idx in (("f32", flat), ("bf16", flat16)):
        phase(f"{name}: ok-rate probe")
        x, valid, lex_order = idx._device
        xsq, bias, lex_rank = idx._device_scan
        slots, raws, ranks, ok = flat_scan.fused_flat_search(
            x, xsq, bias, lex_rank, qdev[:B], metric="cosine", k=16)
        fetch_barrier(slots)
        phase(f"{name}: batch ok={bool(np.asarray(ok))}")
        t0 = time.perf_counter()
        for i in range(6):
            s = (i * 37) % (qdev.shape[0] - B)
            out = idx.search_batch_device(
                jax.lax.dynamic_slice_in_dim(qdev, s, B), 10)
        fetch_barrier(out)
        dt = (time.perf_counter() - t0) / 6
        phase(f"{name}: {dt * 1000:.1f} ms/batch ({B / dt:.0f} qps)")


if __name__ == "__main__":
    main()
