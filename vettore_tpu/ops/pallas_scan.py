"""Pallas fused flat-scan kernel: tiled MXU matmul + on-chip tile top-k.

The XLA flat path materializes the full ``[B, N]`` score matrix in HBM and
runs a global TopK over it — at 1M rows and 512 queries that is ~2 GB of
extra HBM traffic per batch. This kernel keeps scores in VMEM: each grid step
loads one row tile, computes ``X_tile @ Q^T`` on the MXU, converts to rank
distances, and extracts the tile's top-k per query by iterative masked
min-extraction (k passes over the VMEM block). Only ``[tiles, B, k]``
candidates ever reach HBM; the exact global (rank, id) merge happens outside
over that small set, so results are bit-deterministic with the XLA path.

Supported metrics: the dot family (cosine/inner_product/
negative_inner_product) and l2/l2_squared via cached squared norms. Other
metrics stay on the XLA elementwise path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024
#: largest per-tile k the iterative extraction supports before the XLA path
#: becomes the better choice
MAX_FUSED_K = 128

PALLAS_METRICS = ("cosine", "inner_product", "negative_inner_product", "l2", "l2_squared")

#: scoped-VMEM budget for kernel buffers (the hardware limit is 16 MiB; leave
#: headroom for compiler temporaries)
_VMEM_BUDGET = 10 * 2**20


def pick_row_tile(d: int, b: int, cap: int):
    """Largest power-of-two row tile whose working set fits VMEM:
    double-buffered x tile (2·rt·d·4) + rank scratch and ~3 temporaries
    (4·rt·b·4) + resident queries (b·d·4). Returns None when no tile fits
    (callers fall back to the XLA path)."""
    for rt in (1024, 512, 256):
        if cap % rt:
            continue
        if 2 * rt * d * 4 + 4 * rt * b * 4 + b * d * 4 <= _VMEM_BUDGET:
            return rt
    return None


def _scan_kernel(x_ref, xsq_ref, bias_ref, lex_ref, q_ref, qsq_ref, vals_ref,
                 idx_ref, flag_ref, rank_scratch, *, metric, k, fast):
    # fast mode (bf16 storage): single native MXU pass; parity mode: HIGHEST
    # precision for f32-exact results
    dots = jnp.dot(
        x_ref[:], q_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )  # [T, B]
    if metric in ("cosine", "inner_product", "negative_inner_product"):
        # cosine rank = 1 - dot (offset applied at merge); inner_product rank
        # = -raw = -dot; negative_inner_product raw = -dot, rank = raw = -dot
        rank = -dots
    else:  # l2 / l2_squared: squared distance (monotonic in the true rank)
        rank = xsq_ref[:] - 2.0 * dots + qsq_ref[:].reshape(1, -1)
    # overflow must be detected on the FULL rank expression (xsq - 2*dots +
    # qsq can overflow while dots stays finite; distances.rs:59-98 recovers
    # per-pair in f64), before the bias add masks anything
    nonfinite = jnp.logical_not(jnp.isfinite(rank))
    # +inf bias masks invalid rows; sanitize non-finite scores so they cannot
    # poison the ordering (overflow is reported via flag_ref instead)
    rank = rank + bias_ref[:]
    rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)
    # flag overflow only for valid rows (broadcast over the lane dimension —
    # scalar-shaped outputs violate TPU tiling constraints)
    valid = bias_ref[:] == 0.0
    overflowed = jnp.any(nonfinite & valid).astype(jnp.int32)
    flag_ref[0, 0, :] = jnp.broadcast_to(overflowed, flag_ref.shape[2:])

    t = rank.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    # Mosaic's argmin lowers only for f32; lex ranks are exact in f32 below
    # 2^24 rows (16.7M), far above a single chip's capacity
    lex = lex_ref[:].astype(jnp.float32)  # [T, 1] lex rank, deterministic ties
    # single VMEM-resident score block; a carried value with an unrolled loop
    # would keep k live copies and blow the scoped-vmem budget
    rank_scratch[:] = rank

    def take(j, _):
        rank_state = rank_scratch[:]
        best = jnp.min(rank_state, axis=0)  # [B]
        # tie-break equal-rank rows by lex rank (flat.rs:34-40 orders by
        # (rank, id)); plain argmin would pick the lowest row index and can
        # drop lex-smaller ids when >k ties share one tile
        is_best = rank_state == best[None, :]
        lex_key = jnp.where(is_best, lex, jnp.inf)
        best_row = jnp.argmin(lex_key, axis=0).astype(jnp.int32)
        vals_ref[0, j, :] = best
        idx_ref[0, j, :] = best_row
        hit = row_ids == best_row[None, :]
        rank_scratch[:] = jnp.where(hit, jnp.inf, rank_state)
        return 0

    jax.lax.fori_loop(0, k, take, 0)


@functools.partial(jax.jit, static_argnames=("metric", "k", "row_tile"))
def pallas_tile_topk(x, xsq, bias, lex, q, *, metric, k, row_tile=ROW_TILE):
    """Per-tile top-k: ``x`` [N, d] (N multiple of row_tile; f32 or bf16),
    ``xsq``/``bias`` [N, 1] (bias 0 valid / +inf invalid), ``lex`` [N, 1]
    int32 lex ranks, ``q`` [B, d].
    Returns ``(vals [tiles, k, B], idx [tiles, k, B], flags [tiles, 1, B])``."""
    n, d = x.shape
    b = q.shape[0]
    tiles = n // row_tile
    fast = x.dtype == jnp.bfloat16
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # [B, 1]
    if fast:
        q = q.astype(jnp.bfloat16)
    kernel = functools.partial(_scan_kernel, metric=metric, k=k, fast=fast)
    # the Mosaic TPU kernel runs interpreted on CPU backends (tests/CI)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, k, b), jnp.float32),
            jax.ShapeDtypeStruct((tiles, k, b), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 1, b), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((row_tile, b), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * 4 + b * d * 4 + tiles * k * b * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, xsq, bias, lex, q, qsq)


@functools.partial(jax.jit, static_argnames=("metric", "k", "row_tile"))
def fused_flat_search(x, xsq, bias, lex_rank, q, *, metric, k, row_tile=ROW_TILE):
    """End-to-end fused scan: Pallas tile top-k + exact (rank, id) merge.

    Returns ``(slots [B, k], raws [B, k], ranks [B, k], all_finite)``, the
    same contract as the XLA ``_search_kernel_batch`` path.
    """
    lex_col = lex_rank.astype(jnp.int32).reshape(-1, 1)
    vals, idx, flags = pallas_tile_topk(x, xsq, bias, lex_col, q,
                                        metric=metric, k=k, row_tile=row_tile)
    tiles = vals.shape[0]
    b = q.shape[0]
    offsets = (jnp.arange(tiles, dtype=jnp.int32) * row_tile)[:, None, None]
    cand_idx = jnp.transpose(idx + offsets, (2, 0, 1)).reshape(b, tiles * k)
    cand_rank = jnp.transpose(vals, (2, 0, 1)).reshape(b, tiles * k)

    if metric == "l2":
        cand_rank = jnp.sqrt(jnp.maximum(cand_rank, 0.0))
    elif metric == "l2_squared":
        cand_rank = jnp.maximum(cand_rank, 0.0)
    elif metric == "cosine":
        cand_rank = 1.0 + cand_rank  # kernel emitted -dot; rank = 1 - dot

    cand_lex = jnp.where(jnp.isfinite(cand_rank), lex_rank[cand_idx], 2**31 - 1)
    rank_s, _, idx_s = jax.lax.sort((cand_rank, cand_lex, cand_idx), num_keys=2,
                                    dimension=1)
    top_rank = rank_s[:, :k]
    top_idx = idx_s[:, :k]

    if metric in ("l2", "l2_squared"):
        raw = top_rank
    else:
        rows = x[jnp.maximum(top_idx, 0)].astype(jnp.float32)
        dots = jnp.einsum("bkd,bd->bk", rows, q.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        raw = -dots if metric == "negative_inner_product" else dots
    all_finite = jnp.sum(flags) == 0
    return top_idx, raw, top_rank, all_finite
