"""Stage-level timing of the funnel pipeline at 1M (synthetic device data)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops import pipeline as pipe
from vettore_tpu.ops import select
from vettore_tpu.ops.transport import fetch_barrier

N, D, B, COUNT = 1_000_448, 768, 512, 200
STAGES = (128, 256, 384)
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def bench(name, fn, *args, iters=6):
    f = jax.jit(fn)
    fetch_barrier(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fetch_barrier(out)
    dt = (time.perf_counter() - t0) / iters
    phase(f"{name}: {dt * 1000:7.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    phase("alloc device data")
    x = jax.random.normal(key, (N, D), dtype=jnp.float32)
    valid = jnp.arange(N) < (N - 448)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.float32)
    fetch_barrier(x)

    def stage1(x, valid, q):
        return pipe._rank_full(x, valid, q, metric="cosine", dims=STAGES[0])
    bench("stage1 rank (128 dims)", stage1, x, valid, q)

    rank, _f = jax.jit(stage1)(x, valid, q)
    fetch_barrier(rank)

    def sel(rank):
        return select.exact_top_c(rank, None, c=COUNT)
    bench("float exact_top_c", sel, rank)

    def whole(x, valid, q):
        return pipe.funnel_pipeline_batch(x, valid, q, None, metric="cosine",
                                          stages=STAGES, count=COUNT, limit=10)
    bench("whole funnel (xla stage1)", whole, x, valid, q, iters=4)

    from vettore_tpu.ops import flat_scan

    xsq = jnp.sum(x[:, :STAGES[0]] ** 2, axis=1)
    bias = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
    fetch_barrier(xsq)

    def stage1_fused(x, xsq, bias, q):
        return flat_scan.fused_stage_candidates(
            x, xsq, bias, q, metric="cosine", count=COUNT, dims=STAGES[0])
    bench("stage1 fused candidates", stage1_fused, x, xsq, bias, q)

    def whole_fused(x, valid, q, xsq):
        return pipe.funnel_pipeline_batch(x, valid, q, xsq, metric="cosine",
                                          stages=STAGES, count=COUNT, limit=10)
    bench("whole funnel (fused stage1)", whole_fused, x, valid, q, xsq, iters=4)


if __name__ == "__main__":
    main()
