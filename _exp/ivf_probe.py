"""IVF feasibility probe at the headline scale (1M x 768 cosine, batch 512).

Design under test: reorder rows by k-means cluster, chop into contiguous
64-row blocks, route queries by block-centroid rank (one small matmul), and
rescore only the top-P blocks per query via the scalar-prefetch Pallas
rescore kernel. Sub-linear HBM traffic: P*64 rows/query instead of N.

Measures: k-means build time (assignment via chunked bf16 matmul + argmax,
segment-sum update), per-phase search costs, end-to-end QPS, recall@10 vs
the exact f32 scan, at P in {8, 16, 32, 64}.
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

from vettore_tpu.ops import flat_scan, select
from vettore_tpu.ops.transport import fetch_barrier

N = 1_000_448  # multiple of 1024
D = 768
B = 512
GROUP = 64
NG = N // GROUP
N_CENTERS = 10_016  # bench-like clustered corpus
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


# ---------------------------------------------------------------- corpus
@jax.jit
def _make_corpus(key):
    kc, ka, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (N_CENTERS, D), dtype=jnp.float32)
    centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
    assign = jax.random.randint(ka, (N,), 0, N_CENTERS)
    sigma = jnp.float32(0.4 / np.sqrt(D))
    data = centers[assign] + sigma * jax.random.normal(kn, (N, D), dtype=jnp.float32)
    data /= jnp.linalg.norm(data, axis=1, keepdims=True)
    return data


@jax.jit
def _make_queries(key, data):
    ki, kn = jax.random.split(key)
    idx = jax.random.randint(ki, (B,), 0, N)
    sigma = jnp.float32(0.4 / np.sqrt(D))
    qs = data[idx] + sigma * jax.random.normal(kn, (B, D), dtype=jnp.float32)
    return qs / jnp.linalg.norm(qs, axis=1, keepdims=True)


phase("generating corpus on device")
x = _make_corpus(jax.random.PRNGKey(0))
fetch_barrier(x)
q = _make_queries(jax.random.PRNGKey(1), x)
fetch_barrier(q)
phase(f"corpus [{N}, {D}] + queries [{B}, {D}] resident")

# ---------------------------------------------------------------- k-means
CHUNK = 65_536 // 4  # 16384 rows/assignment chunk


@jax.jit
def _assign_chunk(xc, cb):
    # cosine routing on normalized data: argmax dot
    dots = jnp.dot(xc.astype(jnp.bfloat16), cb.T,
                   preferred_element_type=jnp.float32)
    return jnp.argmax(dots, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, donate_argnums=(0,))
def _update(cent, xf, assign):
    sums = jnp.zeros((NG, D), jnp.float32).at[assign].add(xf)
    cnts = jnp.zeros((NG,), jnp.float32).at[assign].add(1.0)
    new = sums / jnp.maximum(cnts, 1.0)[:, None]
    return jnp.where((cnts > 0)[:, None], new, cent), cnts


def kmeans(x, iters):
    stride = N // NG
    cent = x[::stride][:NG]
    cb = cent.astype(jnp.bfloat16)
    assign = None
    for it in range(iters):
        t0 = time.perf_counter()
        parts = []
        for s in range(0, N, CHUNK):
            parts.append(_assign_chunk(jax.lax.dynamic_slice_in_dim(x, s, CHUNK), cb))
        assign = jnp.concatenate(parts)
        cent, cnts = _update(cent, x, assign)
        cb = cent.astype(jnp.bfloat16)
        fetch_barrier(cb)
        phase(f"  kmeans iter {it}: {time.perf_counter() - t0:.2f}s "
              f"(max cluster {int(jnp.max(cnts))})")
    return cent, assign


phase("kmeans build")
t0 = time.perf_counter()
KM_ITERS = 4
cent, assign = kmeans(x, KM_ITERS)
build_assign_s = time.perf_counter() - t0

# reorder rows by (cluster, slot), chop into 64-row blocks, block centroids
t0 = time.perf_counter()
perm = jnp.argsort(assign, stable=True)
xs = x[perm]  # [N, D] cluster-ordered
block_cent = jnp.mean(xs.reshape(NG, GROUP, D), axis=1)
block_cent /= jnp.maximum(jnp.linalg.norm(block_cent, axis=1, keepdims=True), 1e-30)
bcb = block_cent.astype(jnp.bfloat16)
xb = xs.astype(jnp.bfloat16)
xsq = jnp.sum(xs.astype(jnp.float32) ** 2, axis=1)
bias = jnp.zeros((N,), jnp.float32)
fetch_barrier(bcb)
layout_s = time.perf_counter() - t0
phase(f"build done: assign {build_assign_s:.1f}s + layout {layout_s:.1f}s")


# ---------------------------------------------------------------- search
@functools.partial(jax.jit, static_argnames=("p", "k"))
def ivf_search(xb, xsq, bias, bcb, qs, *, p, k):
    qb = qs.astype(jnp.bfloat16)
    crank = -jnp.dot(qb, bcb.T, preferred_element_type=jnp.float32)  # [B, NG]
    _v, gidx, _ok = select.group_topk(crank, p)
    gidx = jnp.minimum(gidx, NG - 1)
    cand = flat_scan._rescore(xb, xsq, bias, qs, gidx, metric="cosine").reshape(
        qs.shape[0], p * GROUP)
    cand_slots = (gidx[:, :, None] * GROUP
                  + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]).reshape(
        qs.shape[0], p * GROUP)
    slots, ranks, _ok2 = select.exact_top_c_slots(cand, cand_slots, c=k)
    # HIGHEST rescore of winners for exact raws
    rows = xb[slots].astype(jnp.float32)
    raw = jnp.einsum("bkd,bd->bk", rows, qs,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return slots, raw


# ground truth: exact bf16-storage scan (the headline mode) AND f32 HIGHEST
phase("ground truth (fused f32 scan)")
lex_rank = jnp.arange(N, dtype=jnp.int32)  # slot order = id order for probe
tslots, _raw, _rk, _ok = flat_scan.fused_flat_search(
    xs, xsq, bias, lex_rank, q, metric="cosine", k=10)
truth = np.asarray(tslots)
fetch_barrier(tslots)
phase("ground truth done")

for P in (8, 16, 32, 64, 128):
    t0 = time.perf_counter()
    slots, raw = ivf_search(xb, xsq, bias, bcb, q, p=P, k=10)
    fetch_barrier(slots)
    compile_s = time.perf_counter() - t0
    got = np.asarray(slots)
    recall = float(np.mean([
        len(set(got[i]) & set(truth[i])) / 10 for i in range(B)]))
    # timed: rotate query blocks
    blocks = [q + 0.0, q * 1.0, jnp.flip(q, 0), q[::-1] + 0.0]
    for bl in blocks:
        fetch_barrier(bl)
    iters = 16
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = ivf_search(xb, xsq, bias, bcb, blocks[i % 4], p=P, k=10)
    fetch_barrier(last[0])
    dt = (time.perf_counter() - t0) / iters
    phase(f"P={P:3d}: recall@10 {recall:.4f}  {dt * 1000:6.2f} ms/batch "
          f"({B / dt:8.0f} QPS)  [compile {compile_s:.1f}s]")

phase("probe complete")
