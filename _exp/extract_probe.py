"""A/B the Pallas covered-row extraction vs the recorded XLA-gather numbers:
whole _hamming_slots + quantized pipeline + fused_stage_candidates at 1M."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vettore_tpu.ops import flat_scan, pipeline as pipe
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
    phase(f"{name}: {(time.perf_counter() - t0) / iters * 1000:7.2f} ms")


def main():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (N, D), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    signs = jnp.where(x >= 0, jnp.int8(1), jnp.int8(-1))
    valid = jnp.ones((N,), bool)
    qs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(2), (B, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    qf = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    fetch_barrier(signs)
    phase("data ready")

    # bare extraction kernel: [B, N/128, 128] i16 source, COUNT rows/query
    ham_fake = jnp.zeros((B, N // 128, 128), jnp.int16)
    gidx = jnp.tile(
        (jnp.arange(COUNT, dtype=jnp.int32) * 13) % (N // 128), (B, 1))
    bench("extract_group_rows i16 [B,500] of 1M", flat_scan.extract_group_rows,
          ham_fake, gidx)
    rank_fake = jnp.zeros((B, N // 128, 128), jnp.float32)
    bench("extract_group_rows f32 [B,208] of 1M", flat_scan.extract_group_rows,
          rank_fake, gidx[:, :208])

    bench("whole _hamming_slots (new)",
          functools.partial(pipe._hamming_slots, count=COUNT, d=D),
          signs, valid, qs, iters=4)

    bench("whole quantized_pipeline_batch",
          functools.partial(pipe.quantized_pipeline_batch,
                            metric="cosine", count=COUNT, limit=10, d=D),
          x, signs, valid, qf, iters=4)

    xsq128 = jnp.sum(x[:, :128].astype(jnp.float32) ** 2, axis=1)
    bias = jnp.zeros((N,), jnp.float32)
    bench("fused_stage_candidates 128d c=200 (new)",
          functools.partial(flat_scan.fused_stage_candidates,
                            metric="cosine", count=200, dims=128),
          x, xsq128, bias, qf, iters=4)

    # sanity: parity of new hamming selection vs direct composite oracle
    small = 131072
    sl, rk, ok = jax.jit(functools.partial(
        pipe._hamming_slots, count=COUNT, d=D))(
        signs[:small], valid[:small], qs[:32])
    dots = jax.lax.dot_general(
        qs[:32], signs[:small], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    ham = (D - dots) >> 1
    sb = pipe._composite_bits(small, D)
    comp = (ham << sb) | jnp.arange(small, dtype=jnp.int32)[None, :]
    from vettore_tpu.ops.select import exact_top_c_unique_int
    oslots, _ = jax.jit(functools.partial(
        exact_top_c_unique_int, c=COUNT))(comp)
    agree = np.array_equal(np.asarray(sl), np.asarray(oslots))
    phase(f"hamming selection parity vs oracle at {small}: {agree}")
    assert agree


if __name__ == "__main__":
    main()
