"""Isolate the 1M quantized-pipeline stall: time compile vs execute for
each stage with synthetic device-generated data (no host ingest)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops import pipeline as pipe
from vettore_tpu.ops.select import exact_top_c
from vettore_tpu.ops.transport import fetch_barrier

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    N, D, B, C = 1_000_000, 768, 512, 500
    phase("session init")
    fetch_barrier(jnp.ones((8, 128)) * 2.0)

    phase("device data gen")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    valid = jnp.ones((N,), bool)
    signs = jnp.where(x >= 0, jnp.int8(1), jnp.int8(-1))
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    fetch_barrier(signs)
    phase("data ready")

    # stage A: hamming rank alone
    f = jax.jit(lambda s, v, qq: pipe._hamming_rank(s, v, pipe.query_signs(qq), d=D))
    t = time.perf_counter()
    lowered = f.lower(signs, valid, q)
    phase(f"hamming lower {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    comp = lowered.compile()
    phase(f"hamming compile {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    out = comp(signs, valid, q)
    fetch_barrier(out)
    phase(f"hamming exec {time.perf_counter()-t:.3f}s")
    t = time.perf_counter()
    fetch_barrier(comp(signs, valid, q))
    phase(f"hamming exec2 {time.perf_counter()-t:.3f}s")

    # stage B: hamming + exact_top_c
    def sel(s, v, qq):
        rank = pipe._hamming_rank(s, v, pipe.query_signs(qq), d=D)
        slots, keys, ok = exact_top_c(rank, None, c=C)
        return slots, ok

    f2 = jax.jit(sel)
    t = time.perf_counter()
    c2 = f2.lower(signs, valid, q).compile()
    phase(f"ham+select compile {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    fetch_barrier(c2(signs, valid, q)[0])
    phase(f"ham+select exec {time.perf_counter()-t:.3f}s")
    t = time.perf_counter()
    fetch_barrier(c2(signs, valid, q)[0])
    phase(f"ham+select exec2 {time.perf_counter()-t:.3f}s")

    # full pipeline
    t = time.perf_counter()
    lowered = pipe.quantized_pipeline_batch.lower(
        x, signs, valid, q, metric="cosine", count=C, limit=10, d=D)
    phase(f"full lower {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    comp = lowered.compile()
    phase(f"full compile {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    fetch_barrier(comp(x, signs, valid, q)[0])
    phase(f"full exec {time.perf_counter()-t:.3f}s")
    t = time.perf_counter()
    fetch_barrier(comp(x, signs, valid, q)[0])
    phase(f"full exec2 {time.perf_counter()-t:.3f}s")


if __name__ == "__main__":
    main()
