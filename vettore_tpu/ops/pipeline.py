"""Fused on-device adaptive search pipelines.

The reference's funnel / quantized / hybrid modes chain batched NIF scans with
candidate lists flowing through Elixir
(/root/reference/lib/vettore/collection.ex:558-713). Here each whole pipeline
— stage scans, candidate selection, and the exact rerank — compiles to ONE
XLA program, so candidates never leave the device and a query costs a single
dispatch.

Invariant: the caller's block is LEX-SORTED — slot order equals id order (the
``_VectorCache`` stores records sorted by id, invalid/pad slots last). Stable
TopK then resolves equal-rank ties to the smallest slot == lexicographically
smallest id, reproducing the reference's (rank, id) heap ordering
(search.rs:23-29) with no per-query gather through a lex permutation — that
gather was the dominant cost of these pipelines at 1M rows.

All shapes are static: candidate counts and limits are bucketed by the caller,
padded positions carry +inf rank / False validity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import batched_raw_scores, rank_from_raw
from .packing import batched_packed_hamming

_BIG = jnp.int32(2**31 - 1)


def _topk_slots_sorted(rank, count):
    """Best ``count`` slots of an ascending-rank array whose slot order is
    id order; returns (slots ascending-by-slot == lex, ok mask)."""
    neg_top, pos = jax.lax.top_k(-rank, count)  # stable: ties -> smallest slot
    ok = jnp.isfinite(-neg_top)
    slots = jnp.where(ok, pos.astype(jnp.int32), _BIG)
    slots = jax.lax.sort(slots)  # candidate sets stay lex-sorted between stages
    return jnp.where(slots < _BIG, slots, 0), slots < _BIG


def stage_full(x, valid, q, *, metric, dims, count):
    """Stage over the full block: scores ``x[:, :dims]`` and selects the best
    ``count`` slots. Returns (slots_lex_sorted, slot_ok, all_finite)."""
    raw = batched_raw_scores(
        x[:, :dims], q[:dims], metric=metric, use_true_cosine=(metric == "cosine")
    )
    rank = rank_from_raw(raw, metric=metric)
    rank = jnp.where(valid, rank, jnp.inf)
    finite = jnp.all(jnp.isfinite(raw) | ~valid)
    slots, ok = _topk_slots_sorted(rank, count)
    return slots, ok, finite


def stage_subset(x, slots, slot_ok, q, *, metric, dims, count):
    """Stage over a candidate subset (slots sorted ascending == by id)."""
    rows = x[slots][:, :dims]
    raw = batched_raw_scores(
        rows, q[:dims], metric=metric, use_true_cosine=(metric == "cosine")
    )
    rank = rank_from_raw(raw, metric=metric)
    rank = jnp.where(slot_ok, rank, jnp.inf)
    finite = jnp.all(jnp.isfinite(raw) | ~slot_ok)
    k = min(count, slots.shape[0])
    neg, pos = jax.lax.top_k(-rank, k)
    ok = jnp.isfinite(-neg)
    sel = jnp.where(ok, slots[pos], _BIG)
    sel = jax.lax.sort(sel)
    return jnp.where(sel < _BIG, sel, 0), sel < _BIG, finite


def subset_rerank(x, slots, slot_ok, q, *, metric, limit):
    """Final exact rerank of a lex-sorted candidate subset at full dims.
    Returns (top_slots best-first, raws, ranks, all_finite)."""
    rows = x[slots]
    raw = batched_raw_scores(
        rows, q, metric=metric, use_true_cosine=(metric == "cosine")
    )
    rank = rank_from_raw(raw, metric=metric)
    rank = jnp.where(slot_ok, rank, jnp.inf)
    finite = jnp.all(jnp.isfinite(raw) | ~slot_ok)
    k = min(limit, slots.shape[0])
    neg, pos = jax.lax.top_k(-rank, k)
    return slots[pos], raw[pos], -neg, finite


def hamming_stage(bits, valid, qbits, *, count):
    """Packed-Hamming candidate stage over the full block."""
    raw = batched_packed_hamming(bits, qbits)
    rank = jnp.where(valid, raw, jnp.inf)
    return _topk_slots_sorted(rank, count)


@functools.partial(jax.jit, static_argnames=("metric", "stages", "count", "limit"))
def funnel_pipeline(x, valid, q, *, metric, stages, count, limit):
    """Matryoshka funnel: prefix stages then exact rerank, one dispatch."""
    slots, ok, finite = stage_full(x, valid, q, metric=metric,
                                   dims=stages[0], count=count)
    for dims in stages[1:]:
        slots, ok, f = stage_subset(x, slots, ok, q, metric=metric,
                                    dims=dims, count=count)
        finite = finite & f
    top, raws, ranks, f = subset_rerank(x, slots, ok, q, metric=metric, limit=limit)
    return top, raws, ranks, finite & f


@functools.partial(jax.jit, static_argnames=("metric", "count", "limit"))
def quantized_pipeline(x, bits, valid, q, qbits, *, metric, count, limit):
    """Binary-quantized candidates (sign-bit Hamming) then exact rerank."""
    slots, ok = hamming_stage(bits, valid, qbits, count=count)
    top, raws, ranks, finite = subset_rerank(x, slots, ok, q, metric=metric, limit=limit)
    return top, raws, ranks, finite


@functools.partial(jax.jit, static_argnames=("metric", "stages", "count"))
def funnel_candidates_pipeline(x, valid, q, *, metric, stages, count):
    """Funnel stages only (hybrid generator): returns lex-sorted candidates."""
    slots, ok, finite = stage_full(x, valid, q, metric=metric,
                                   dims=stages[0], count=count)
    for dims in stages[1:]:
        slots, ok, f = stage_subset(x, slots, ok, q, metric=metric,
                                    dims=dims, count=count)
        finite = finite & f
    return slots, ok, finite


@functools.partial(jax.jit, static_argnames=("count",))
def quantized_candidates_pipeline(bits, valid, qbits, *, count):
    """Hamming candidates only (hybrid generator)."""
    return hamming_stage(bits, valid, qbits, count=count)


@functools.partial(jax.jit, static_argnames=("metric", "limit"))
def rerank_pipeline(x, slots, slot_ok, q, *, metric, limit):
    """Standalone exact rerank over an arbitrary candidate set."""
    return subset_rerank(x, slots, slot_ok, q, metric=metric, limit=limit)


# ---------------------------------------------------------------------------
# Batched variants: one dispatch for a whole query batch (serving path —
# per-query dispatches through a remote tunnel are RTT-bound)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "stages", "count", "limit"))
def funnel_pipeline_batch(x, valid, queries, *, metric, stages, count, limit):
    """Vmapped :func:`funnel_pipeline` over ``queries`` [B, d]."""

    def one(q):
        return funnel_pipeline(x, valid, q, metric=metric, stages=stages,
                               count=count, limit=limit)

    return jax.vmap(one)(queries)


@functools.partial(jax.jit, static_argnames=("metric", "count", "limit"))
def quantized_pipeline_batch(x, bits, valid, queries, qbits, *, metric, count, limit):
    """Vmapped :func:`quantized_pipeline` over ``queries`` [B, d] and
    ``qbits`` [B, W]."""

    def one(q, qb):
        return quantized_pipeline(x, bits, valid, q, qb, metric=metric,
                                  count=count, limit=limit)

    return jax.vmap(one)(queries, qbits)
