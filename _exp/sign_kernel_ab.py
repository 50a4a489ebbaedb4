"""A/B the fused sign scan's in-kernel dot: int8 MXU vs bf16-cast MXU.
Runs AFTER the bench finishes (chip contention skews both)."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np

from vettore_tpu.ops import flat_scan
from vettore_tpu.ops.transport import fetch_barrier

N, D, B = 1_000_448, 768, 512
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def _body_bf16(s_ref, valid_ref, qt_ref, gmin_ref, ham_ref, *, d):
    dots = jnp.dot(s_ref[:].astype(jnp.bfloat16), qt_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # exact ints <= d
    ham = (d - dots.astype(jnp.int32)) >> 1
    ham = jnp.where(valid_ref[:] != 0, ham, flat_scan._BIG16)
    t, b = ham.shape
    gmin_ref[:] = jnp.min(ham.reshape(t // 64, 64, b), axis=1)
    ham_ref[:] = ham.T.astype(jnp.int16)


def run(name, body):
    signs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(1), (N, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    valid8 = jnp.ones((N, 1), jnp.int8)
    qs = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(2), (B, D)) > 0.5,
        jnp.int8(1), jnp.int8(-1))
    fetch_barrier(signs)
    kernel = functools.partial(body, d=D)
    tiles = N // 512

    def call(signs, valid8, qs):
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((512, D), lambda i: (i, 0)),
                pl.BlockSpec((512, 1), lambda i: (i, 0)),
                pl.BlockSpec((D, B), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((512 // 64, B), lambda i: (i, 0)),
                pl.BlockSpec((B, 512), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N // 64, B), jnp.int32),
                jax.ShapeDtypeStruct((B, N), jnp.int16),
            ],
        )(signs, valid8, qs.T)

    f = jax.jit(call)
    out = f(signs, valid8, qs)
    fetch_barrier(out[0])
    t0 = time.perf_counter()
    for _ in range(6):
        out = f(signs, valid8, qs)
    fetch_barrier(out[0])
    phase(f"{name}: {(time.perf_counter() - t0) / 6 * 1000:6.1f} ms")
    return np.asarray(out[1][:2, :1024])


def _body_int8(s_ref, valid_ref, qt_ref, gmin_ref, ham_ref, *, d):
    dots = jnp.dot(s_ref[:], qt_ref[:], preferred_element_type=jnp.int32)
    ham = (d - dots) >> 1
    ham = jnp.where(valid_ref[:] != 0, ham, flat_scan._BIG16)
    t, b = ham.shape
    gmin_ref[:] = jnp.min(ham.reshape(t // 64, 64, b), axis=1)
    ham_ref[:] = ham.T.astype(jnp.int16)


def main():
    a = run("int8 dot kernel", _body_int8)
    b = run("bf16 dot kernel", _body_bf16)
    print("ham parity:", np.array_equal(a, b))


if __name__ == "__main__":
    main()
