"""Bisect the fused MaxSim 1M compile OOM: compile the rank scan alone,
then rank+selection, then the full topk program, printing HBM use."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vettore_tpu.ops import maxsim as mx

N, T, D = 1_000_000, 32, 128
NPAD = -(-N // 1024) * 1024
B, QT = 64, 4
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    nt = NPAD * T
    tokens_s = jax.ShapeDtypeStruct((NPAD, T, D), jnp.bfloat16)
    counts_s = jax.ShapeDtypeStruct((NPAD,), jnp.int32)
    valid_s = jax.ShapeDtypeStruct((NPAD,), jnp.bool_)
    qtok_s = jax.ShapeDtypeStruct((B, QT, D), jnp.float32)
    qmask_s = jax.ShapeDtypeStruct((B, QT), jnp.bool_)

    row_tile = mx._mv_row_tile(T, D, B * QT, 2, nt)
    phase(f"row_tile={row_tile}")

    import functools

    # 1) rank scan alone
    def rank_only(tokens, counts, valid, qtok):
        x2 = tokens.reshape(nt, D)
        tsq = mx._row_sq_sums(x2)
        tn = jnp.sqrt(tsq)
        tinv = jnp.where(tn > 0.0, 1.0 / jnp.maximum(tn, 1e-38), 0.0)
        token_live = (jnp.arange(T, dtype=jnp.int32)[None, :]
                      < counts[:, None]).reshape(nt)
        tbias = jnp.where(token_live, 0.0, mx._PAD_SIM).astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qtok.astype(jnp.float32) ** 2, axis=2))
        qinv = jnp.where(qn > 0.0, 1.0 / jnp.maximum(qn, 1e-38), 0.0)
        dzero = (counts <= 0).astype(jnp.float32)
        dbias = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
        qt = qtok.reshape(B * QT, D).T.astype(x2.dtype)
        return mx.fused_maxsim_rank_scan(
            x2, tinv.reshape(-1, 1), tbias.reshape(-1, 1),
            dzero.reshape(-1, 1), dbias.reshape(-1, 1), qt,
            qinv.reshape(1, -1), t=T, b=B, metric="cosine",
            row_tile=row_tile)

    for name, fn in (("rank_only", rank_only),):
        phase(f"compiling {name}")
        try:
            lowered = jax.jit(fn).lower(tokens_s, counts_s, valid_s, qtok_s)
            compiled = lowered.compile()
            mem = compiled.memory_analysis()
            phase(f"{name}: ok, temp={mem.temp_size_in_bytes/2**30:.2f} GiB "
                  f"args={mem.argument_size_in_bytes/2**30:.2f} GiB "
                  f"out={mem.output_size_in_bytes/2**30:.2f} GiB")
        except Exception as exc:
            phase(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")

    # 2) full topk
    phase("compiling full topk")
    try:
        fn = functools.partial(mx.fused_maxsim_topk_batch, metric="cosine",
                               limit=10, t=T, b=B)
        lowered = jax.jit(fn).lower(tokens_s, counts_s, valid_s, qtok_s,
                                    qmask_s)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        phase(f"full: ok, temp={mem.temp_size_in_bytes/2**30:.2f} GiB")
    except Exception as exc:
        phase(f"full: FAILED {type(exc).__name__}: {str(exc)[:400]}")


if __name__ == "__main__":
    main()
