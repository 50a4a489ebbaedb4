"""Probe: why is the bf16 pass-1 gmin scan 11 ms when its HBM floor is ~5?

Variants at 1M x 768 bf16, batch 512, cosine (device-generated data — no
host upload):
  floor      : plain jnp.min over the whole block (HBM read-rate ceiling)
  current@T  : production _gmin_body at row_tile T
  bare@T     : dot + group-min only (no flag / isfinite / bias epilogue)
  lean@T     : dot + bias + group-min (flag dropped, one where kept)
  inner@T/S  : row_tile T streamed, body loops over S-row sub-tiles so the
               f32 dots block stays small (VMEM headroom -> deeper pipeline)
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vettore_tpu.ops.flat_scan import GROUP, _gmin_scan
from vettore_tpu.ops.transport import fetch_barrier

N, D, B = 1_000_000, 768, 512
REPS = 8


def timed(name, fn, *args):
    out = fn(*args)
    fetch_barrier(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fetch_barrier(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:24s} {ms:8.2f} ms")
    return ms


def bare_body(x_ref, qt_ref, gmin_ref):
    dots = jnp.dot(x_ref[:], qt_ref[:], preferred_element_type=jnp.float32)
    t, b = dots.shape
    gmin_ref[:] = jnp.min(-dots.reshape(t // GROUP, GROUP, b), axis=1)


def lean_body(x_ref, bias_ref, qt_ref, gmin_ref):
    dots = jnp.dot(x_ref[:], qt_ref[:], preferred_element_type=jnp.float32)
    rank = bias_ref[:] - dots
    rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)
    t, b = rank.shape
    gmin_ref[:] = jnp.min(rank.reshape(t // GROUP, GROUP, b), axis=1)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def bare_scan(x, q, *, row_tile):
    n, d = x.shape
    b = q.shape[0]
    qt = q.astype(jnp.bfloat16).T
    return pl.pallas_call(
        bare_body,
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, b), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile // GROUP, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * 2 + b * d * 2 + n // GROUP * b * 4,
            transcendentals=0,
        ),
    )(x, qt)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def lean_scan(x, bias, q, *, row_tile):
    n, d = x.shape
    b = q.shape[0]
    qt = q.astype(jnp.bfloat16).T
    return pl.pallas_call(
        lean_body,
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((d, b), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile // GROUP, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * 2 + b * d * 2 + n // GROUP * b * 4,
            transcendentals=0,
        ),
    )(x, bias.reshape(-1, 1), qt)


def inner_body(x_ref, bias_ref, qt_ref, gmin_ref, *, sub):
    t = x_ref.shape[0]
    for s in range(t // sub):
        xs = x_ref[s * sub:(s + 1) * sub, :]
        dots = jnp.dot(xs, qt_ref[:], preferred_element_type=jnp.float32)
        rank = bias_ref[s * sub:(s + 1) * sub, :] - dots
        rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)
        gmin_ref[s * (sub // GROUP):(s + 1) * (sub // GROUP), :] = jnp.min(
            rank.reshape(sub // GROUP, GROUP, -1), axis=1)


@functools.partial(jax.jit, static_argnames=("row_tile", "sub"))
def inner_scan(x, bias, q, *, row_tile, sub):
    n, d = x.shape
    b = q.shape[0]
    qt = q.astype(jnp.bfloat16).T
    return pl.pallas_call(
        functools.partial(inner_body, sub=sub),
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((d, b), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile // GROUP, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * 2 + b * d * 2 + n // GROUP * b * 4,
            transcendentals=0,
        ),
    )(x, bias.reshape(-1, 1), qt)


def main():
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.bfloat16)
    q = jax.random.normal(kq, (B, D), jnp.float32)
    xsq = jnp.sum(x.astype(jnp.float32) ** 2, axis=1)
    bias = jnp.zeros((N,), jnp.float32)
    fetch_barrier((x, q, xsq, bias))
    print(f"data ready: {N}x{D} bf16 ({N*D*2/2**30:.2f} GiB)")

    if os.environ.get("PROBE_ALL"):
        timed("floor(min over x)", jax.jit(lambda a: jnp.min(a)), x)
        for t in (512, 1024):
            timed(f"bare@{t}", functools.partial(bare_scan, row_tile=t), x, q)
        for t in (512, 1024):
            timed(f"lean@{t}", functools.partial(lean_scan, row_tile=t), x, bias, q)
    if os.environ.get("PROBE_INNER"):
        for t, s in ((4096, 512), (4096, 1024), (8192, 512)):
            timed(f"inner@{t}/{s}",
                  functools.partial(inner_scan, row_tile=t, sub=s), x, bias, q)
    for t in (512, 1024):
        cur = jax.jit(functools.partial(_gmin_scan, metric="cosine", row_tile=t))
        timed(f"current@{t}", cur, x, xsq, bias, q)


if __name__ == "__main__":
    main()
