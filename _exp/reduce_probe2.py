"""Round 2: reduce_window vs reshape-reduce; i16 dot epilogue; i16 gmin."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops.transport import fetch_barrier

B, N, D = 512, 1_000_448, 768
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
    phase("alloc")
    r = jax.random.uniform(jax.random.PRNGKey(0), (B, N), dtype=jnp.float32)
    fetch_barrier(r)

    def rw(r):
        return jax.lax.reduce_window(r, jnp.inf, jax.lax.min,
                                     (1, 64), (1, 64), "VALID")
    bench("reduce_window f32", rw, r)

    r16 = (r * 1000).astype(jnp.int16)
    fetch_barrier(r16)
    bench("gmin i16 reshape", lambda x: jnp.min(x.reshape(B, NG, 64), axis=2), r16)

    def rw16(x):
        return jax.lax.reduce_window(x, jnp.int16(32767), jax.lax.min,
                                     (1, 64), (1, 64), "VALID")
    bench("reduce_window i16", rw16, r16)

    del r, r16
    signs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(1), (N, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    qs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(2), (B, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    fetch_barrier(signs)

    def dot16(qs, signs):
        return jax.lax.dot_general(qs, signs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int16)
    try:
        bench("int8 dot -> i16 out", dot16, qs, signs)
    except Exception as exc:
        phase(f"i16 dot failed: {type(exc).__name__}: {str(exc)[:200]}")

    def dot_ham16(qs, signs):
        dots = jax.lax.dot_general(qs, signs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        return ((D - dots) >> 1).astype(jnp.int16)
    bench("int8 dot + i16 ham epilogue", dot_ham16, qs, signs)

    def dot_ham_gmin(qs, signs):
        ham = dot_ham16(qs, signs)
        return jnp.min(ham.reshape(B, NG, 64), axis=2)
    bench("dot + ham16 + gmin fused?", dot_ham_gmin, qs, signs)


if __name__ == "__main__":
    main()
