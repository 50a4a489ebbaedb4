"""Stage-level timing of the quantized pipeline at 1M (synthetic device data).

Stages: (1) int8 sign dot / Hamming rank, (2) composite-key exact selection,
(3) candidate sort + subset rescore + final top-k, (4) whole pipeline.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vettore_tpu.ops import pipeline as pipe
from vettore_tpu.ops import select
from vettore_tpu.ops.transport import fetch_barrier

N, D, B, COUNT = 1_000_448, 768, 512, 500
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
    phase(f"{name}: {dt * 1000:7.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    phase("alloc device data")
    x = jax.random.normal(key, (N, D), dtype=jnp.float32)
    signs = jnp.where(x >= 0, jnp.int8(1), jnp.int8(-1))
    valid = jnp.arange(N) < (N - 448)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.float32)
    qs = jnp.where(q >= 0, jnp.int8(1), jnp.int8(-1))
    fetch_barrier(signs)
    fetch_barrier(qs)

    # stage 1: the sign dot alone (int8 MXU?)
    def dot_i8(qs, signs):
        return jax.lax.dot_general(qs, signs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    bench("int8 dot [B,D]x[N,D]T", dot_i8, qs, signs)

    def dot_bf16(qs, signs):
        return jax.lax.dot_general(
            qs.astype(jnp.bfloat16), signs.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    bench("bf16 dot same", dot_bf16, qs, signs)

    # stage 2: composite build + selection given the dot output
    dots = jax.jit(dot_i8)(qs, signs)
    fetch_barrier(dots)
    slot_bits = pipe._composite_bits(N, D)
    phase(f"slot_bits={slot_bits}")

    def composite_sel(dots, valid):
        ham = (D - dots) >> 1
        comp = (ham << slot_bits) | jnp.arange(N, dtype=jnp.int32)[None, :]
        comp = jnp.where(valid[None, :], comp, 2**31 - 1)
        return select.exact_top_c_unique_int(comp, c=COUNT)
    bench("composite+select", composite_sel, dots, valid)

    def hs(signs, valid, qs):
        return pipe._hamming_slots(signs, valid, qs, count=COUNT, d=D)
    bench("hamming_slots (current)", hs, signs, valid, qs)

    # stage 3: sort + subset rescore + final top-k
    slots, _k = jax.jit(composite_sel)(dots, valid)
    fetch_barrier(slots)

    def rescore(x, slots, q):
        s2, ok = pipe._sort_candidates(slots, COUNT)
        raw, rank_f, finite = pipe._subset_raw_rank(x, s2, ok, q,
                                                    metric="cosine", dims=D)
        return raw
    bench("sort+rescore", rescore, x, slots, q)

    # stage 4: whole pipeline
    def whole(x, signs, valid, q):
        return pipe.quantized_pipeline_batch(x, signs, valid, q,
                                             metric="cosine", count=COUNT,
                                             limit=10, d=D)
    bench("whole pipeline", whole, x, signs, valid, q, iters=4)


if __name__ == "__main__":
    main()
