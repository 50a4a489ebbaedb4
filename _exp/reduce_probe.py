"""Why is the [B, NG, 64] group-min reduce 5x off HBM roofline?"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vettore_tpu.ops.transport import fetch_barrier

B, N = 512, 1_000_448
NG = N // 64
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
    dt = (time.perf_counter() - t0) / iters
    gbps = 2.0 * (B * N * 4 / 1e9) / dt if "half" not in name else (B * N * 2 / 1e9) / dt
    phase(f"{name}: {dt * 1000:7.2f} ms")


def main():
    phase("alloc")
    r = jax.random.uniform(jax.random.PRNGKey(0), (B, N), dtype=jnp.float32)
    fetch_barrier(r)

    bench("full-row min (roofline read)", lambda r: jnp.min(r, axis=1), r)
    bench("gmin reshape axis2", lambda r: jnp.min(r.reshape(B, NG, 64), axis=2), r)
    bench("gmin two-step 64->8->1",
          lambda r: jnp.min(jnp.min(r.reshape(B, NG, 8, 8), axis=3), axis=2), r)
    bench("gmin via strided minimum x6",
          lambda r: _strided(r), r)
    bench("gmin axis1 [B,64,NG] view",
          lambda r: jnp.min(r.reshape(B, NG, 64), axis=2), r)

    # Pallas row-block group-min
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.min(x.reshape(x.shape[0], x.shape[1] // 64, 64), axis=2)

    def pallas_gmin(r):
        bq = 64
        return pl.pallas_call(
            kernel,
            grid=(B // bq,),
            in_specs=[pl.BlockSpec((bq, N), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((bq, NG), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NG), jnp.float32),
        )(r)
    bench("pallas gmin (row-block)", pallas_gmin, r)

    r16 = r.astype(jnp.bfloat16)
    fetch_barrier(r16)
    bench("gmin bf16 half traffic", lambda r: jnp.min(r.reshape(B, NG, 64), axis=2), r16)


def _strided(r):
    x = r.reshape(B, NG, 64)
    for _ in range(6):
        x = jnp.minimum(x[..., ::2], x[..., 1::2])
    return x[..., 0]


if __name__ == "__main__":
    main()
