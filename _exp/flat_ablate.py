"""Ablation: where do the fused flat scan's milliseconds go at 1M x 768?

Decomposes ops/flat_scan.fused_flat_search into cumulative stages, timed
separately for f32-HIGHEST and bf16 storage. Uses the bench corpus cache.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import cached_corpus, make_queries
from vettore_tpu.ops.flat_scan import GROUP, GROUP_SLACK, _BIG32
from vettore_tpu.ops.transport import fetch_barrier, put_f32_matrix

N, D, B, K = 1_000_000, 768, 512, 10


@functools.partial(jax.jit, static_argnames=("stage", "k"))
def staged(x, lex_rank, q, *, stage, k):
    fast = x.dtype == jnp.bfloat16
    qd = q.astype(jnp.bfloat16) if fast else q
    dots = jnp.dot(qd, x.T, preferred_element_type=jnp.float32,
                   precision=None if fast else jax.lax.Precision.HIGHEST)
    rank = -dots
    if stage == "matmul":
        return jnp.sum(rank[:, ::4096])
    n = x.shape[0]
    b = q.shape[0]
    ng = n // GROUP
    rank_g = rank.reshape(b, ng, GROUP)
    gmin = jnp.min(rank_g, axis=2)
    if stage == "gmin":
        return jnp.sum(gmin[:, ::64])
    gsel = min(k + GROUP_SLACK, ng)
    neg_gtop, gidx = jax.lax.top_k(-gmin, gsel)
    if stage == "gtopk":
        return jnp.sum(gidx)
    cand = jnp.take_along_axis(rank_g, gidx[:, :, None], axis=1).reshape(b, gsel * GROUP)
    cand_slots = (
        gidx[:, :, None] * GROUP + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    ).reshape(b, gsel * GROUP)
    if stage == "gather":
        return jnp.sum(cand) + jnp.sum(cand_slots)
    cand_lex = jnp.where(jnp.isfinite(cand), lex_rank[cand_slots], _BIG32)
    rank_s, _, slot_s = jax.lax.sort((cand, cand_lex, cand_slots), num_keys=2, dimension=1)
    if stage == "sort":
        return jnp.sum(slot_s[:, :k])
    rows = x[slot_s[:, :k]].astype(jnp.float32)
    rdots = jnp.einsum("bkd,bd->bk", rows, q.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return jnp.sum(rdots)


def main():
    data = cached_corpus(N, D)
    queries = make_queries(data, 2 * B)
    x32 = put_f32_matrix(data)
    fetch_barrier(x32)
    x16 = x32.astype(jnp.bfloat16)
    fetch_barrier(x16)
    lex = jnp.arange(N, dtype=jnp.int32)  # ids are already lex-ordered
    qdev = jnp.asarray(queries.astype(np.float32))

    for label, x in (("f32", x32), ("bf16", x16)):
        for stage in ("matmul", "gmin", "gtopk", "gather", "sort", "full"):
            def dispatch(i):
                s = (i * 37) % (qdev.shape[0] - B)
                return staged(x, lex, jax.lax.dynamic_slice_in_dim(qdev, s, B),
                              stage=stage, k=K)
            fetch_barrier(dispatch(0))
            t0 = time.perf_counter()
            last = None
            for i in range(6):
                last = dispatch(i)
            fetch_barrier(last)
            ms = (time.perf_counter() - t0) / 6 * 1000
            print(f"{label:5s} {stage:7s}: {ms:7.2f} ms/batch  "
                  f"({B / ms * 1000:8.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
