"""End-to-end fused_flat_search timing at the headline config (1M x 768
cosine, batch 512, k=10) — bf16 and f32 storage, device-generated data."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops.flat_scan import fused_flat_search
from vettore_tpu.ops.transport import fetch_barrier

# production cap for 1M rows: next _ROW_TILE (1024) multiple — ng divisible
# by 8, keeping group_topk on its recursive descent path
N, D, B, K = 1_000_448, 768, 512, 10
REPS = 8


def timed(name, fn, *args):
    out = fn(*args)
    fetch_barrier(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fetch_barrier(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:18s} {ms:8.2f} ms/batch  {B / ms * 1e3:9.0f} QPS")
    return out


def main():
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    xf = jax.random.normal(kx, (N, D), jnp.float32)
    xf = xf / jnp.linalg.norm(xf, axis=1, keepdims=True)
    q = jax.random.normal(kq, (B, D), jnp.float32)
    xsq = jnp.sum(xf * xf, axis=1)
    bias = jnp.zeros((N,), jnp.float32)
    lex = jnp.arange(N, dtype=jnp.int32)
    xb = xf.astype(jnp.bfloat16)
    fetch_barrier((xf, xb, q, xsq, bias, lex))
    print(f"data ready: {N}x{D}")

    fn = functools.partial(fused_flat_search, metric="cosine", k=K)
    out = timed("bf16 fused", fn, xb, xsq, bias, lex, q)
    print("  ok:", bool(jax.device_get(out[3])))
    if os.environ.get("PROBE_F32"):
        out = timed("f32 fused", fn, xf, xsq, bias, lex, q)
        print("  ok:", bool(jax.device_get(out[3])))


if __name__ == "__main__":
    main()
