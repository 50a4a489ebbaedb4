"""int8 storage view at 1M x 768: QPS + overlap@10 vs the exact f32 scan."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import cached_corpus, make_queries, overlap_at_k

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    from vettore_tpu.index.flat import FlatIndex
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

    phase("ground truth (exact f32)")
    truth = flat.search_batch(queries[:B], 10)

    qdev = jnp.asarray(queries.astype(np.float32))
    for name in ("int8", "bf16"):
        view = flat.storage_view(name)
        hits = view.search_batch(queries[:B], 10)
        ov = overlap_at_k(hits, truth)
        fetch_barrier(view.search_batch_device(qdev[:B], 10)[0])
        t0 = time.perf_counter()
        for i in range(8):
            s = (i * 37) % (qdev.shape[0] - B)
            out = view.search_batch_device(
                jax.lax.dynamic_slice_in_dim(qdev, s, B), 10)
        fetch_barrier(out[0])
        dt = (time.perf_counter() - t0) / 8
        phase(f"{name}: {dt * 1000:6.1f} ms/batch ({B / dt:7.0f} qps) "
              f"overlap@10={ov:.4f}")
        del view


if __name__ == "__main__":
    main()
