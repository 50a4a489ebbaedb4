"""Piecewise timing of the float exact_top_c at [512, 1M] (funnel stage-1
selection measured 37.9 ms; theory says ~12)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops import select
from vettore_tpu.ops.transport import fetch_barrier

B, N, C = 512, 1_000_448, 200
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    fetch_barrier(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fetch_barrier(out)
    phase(f"{name}: {(time.perf_counter() - t0) / iters * 1000:7.2f} ms")


def main():
    key = jax.random.PRNGKey(0)
    phase("alloc")
    rank = jax.random.uniform(key, (B, N), dtype=jnp.float32)
    fetch_barrier(rank)

    bench("gmin reduce [B,N]->[B,N/64]",
          lambda r: jnp.min(r.reshape(B, N // 64, 64), axis=2), rank)

    gmin = jax.jit(lambda r: jnp.min(r.reshape(B, N // 64, 64), axis=2))(rank)
    fetch_barrier(gmin)

    bench("group_topk on [B,15632] f32",
          lambda g: select.group_topk(g, C + select.SLACK), gmin)

    slots0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    bench("_level(64) full", lambda r: select._level(r, slots0, C, 64)[0], rank)

    k2 = jax.jit(lambda r: select._level(r, slots0, C, 64)[0])(rank)
    s2 = jnp.zeros(k2.shape, jnp.int32)
    fetch_barrier(k2)
    bench("_level(8) second", lambda r: select._level(r, s2, C, 8)[0], k2)

    k3 = jax.jit(lambda r: select._level(r, s2, C, 8)[0])(k2)
    s3 = jnp.zeros(k3.shape, jnp.int32)
    fetch_barrier(k3)
    bench("final 3-op sort + lex",
          lambda k: jax.lax.sort((k, s3, s3), num_keys=1, dimension=1)[0], k3)

    bench("whole exact_top_c", lambda r: select.exact_top_c(r, None, c=C),
          rank, iters=4)


if __name__ == "__main__":
    main()
