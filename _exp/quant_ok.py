"""Check ok-flag rate + select timing for quantized at 1M (tie hypothesis)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops import pipeline as pipe
from vettore_tpu.ops.transport import fetch_barrier

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    N, D, B, C = 1_000_000, 768, 512, 500
    fetch_barrier(jnp.ones((8, 128)) * 2.0)
    phase("session up; gen data")
    key = jax.random.PRNGKey(0)
    # clustered-ish: centers + noise to mimic the bench corpus tie structure
    centers = jax.random.normal(key, (10_000, D), jnp.float32)
    asg = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 10_000)
    x = centers[asg] + 0.4 / (D ** 0.5) * jax.random.normal(
        jax.random.PRNGKey(3), (N, D), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    valid = jnp.ones((N,), bool)
    signs = jnp.where(x >= 0, jnp.int8(1), jnp.int8(-1))
    q = x[:B] + 0.01 * jax.random.normal(jax.random.PRNGKey(4), (B, D), jnp.float32)
    fetch_barrier(signs)
    phase("data ready")

    t = time.perf_counter()
    out = pipe.quantized_pipeline_batch(
        x, signs, valid, q, metric="cosine", count=C, limit=10, d=D)
    ok = jax.device_get(out[3])
    phase(f"full first {time.perf_counter()-t:.1f}s  ok_rate={ok.mean():.3f}")
    t = time.perf_counter()
    for _ in range(3):
        out = pipe.quantized_pipeline_batch(
            x, signs, valid, q, metric="cosine", count=C, limit=10, d=D)
    fetch_barrier(out[0])
    dt = (time.perf_counter() - t) / 3
    phase(f"warm {dt*1000:.1f} ms/batch ({B/dt:.0f} qps)")


if __name__ == "__main__":
    main()
