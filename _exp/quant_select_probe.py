"""Piecewise timing of the grouped Hamming selection at 1M (quantized
pipeline's ~19 ms selection tail)."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vettore_tpu.ops import flat_scan, pipeline as pipe, select
from vettore_tpu.ops.transport import fetch_barrier

N, D, B, COUNT = 1_000_448, 768, 512, 500
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
    phase(f"{name}: {(time.perf_counter() - t0) / iters * 1000:7.2f} ms")


def main():
    signs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(1), (N, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    valid8 = jnp.ones((N,), jnp.int8)
    qs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(2), (B, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    fetch_barrier(signs)

    rt = flat_scan._pick_row_tile(N, D, B, 1, tb_factor=3.0)
    gmin, ham16 = flat_scan.fused_sign_scan(signs, valid8, qs, d=D, row_tile=rt)
    gmin = jnp.minimum(gmin, D + 1)
    fetch_barrier(gmin)

    bench("pass1 fused_sign_scan",
          functools.partial(flat_scan.fused_sign_scan, d=D, row_tile=rt),
          signs, valid8, qs)

    gbits = max(1, (NG - 1).bit_length())

    def gsel_only(gmin):
        gcomp = (gmin << gbits) | jnp.arange(NG, dtype=jnp.int32)[None, :]
        return select.exact_top_c_unique_int(gcomp, c=COUNT)
    bench("group composite select [B,15632]", gsel_only, gmin)

    gslots, _ = jax.jit(gsel_only)(gmin)
    fetch_barrier(gslots)

    def gather_sub(ham16, gslots):
        hg = ham16.reshape(B, NG, 64)
        return jnp.take_along_axis(hg, gslots[:, :, None], axis=1)
    bench("gather covered groups [B,500,64]", gather_sub, ham16, gslots)

    sub = jax.jit(gather_sub)(ham16, gslots)
    fetch_barrier(sub)
    slot_bits = pipe._composite_bits(N, D)

    def elem_select(sub, gslots):
        sub_slots = (gslots[:, :, None] * 64
                     + jnp.arange(64, dtype=jnp.int32)[None, None, :])
        comp = jnp.where(sub < pipe._BIG16,
                         (sub.astype(jnp.int32) << slot_bits) | sub_slots,
                         pipe._BIG32).reshape(B, COUNT * 64)
        return select.exact_top_c_unique_int(comp, c=COUNT)
    bench("element composite select [B,32000]", elem_select, sub, gslots)

    def whole(signs, valid, qs):
        return pipe._hamming_slots(signs, valid != 0, qs, count=COUNT, d=D)
    bench("whole _hamming_slots", whole, signs, valid8, qs, iters=4)


if __name__ == "__main__":
    main()
