"""Fused on-device adaptive search pipelines.

The reference's funnel / quantized / hybrid modes chain batched NIF scans with
candidate lists flowing through Elixir
(/root/reference/lib/vettore/collection.ex:558-713). Here each whole pipeline
— stage scans, candidate selection, and the exact rerank — compiles to ONE
XLA program, so candidates never leave the device and a query costs a single
dispatch.

Invariant: candidate slot arrays are kept sorted by lexicographic id rank
between stages; XLA's stable TopK then resolves equal-rank ties to the
smallest id, reproducing the reference's (rank, id) heap ordering
(search.rs:23-29).

All shapes are static: candidate counts and limits are bucketed by the caller,
padded positions carry +inf rank / False validity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import batched_raw_scores, rank_from_raw
from .packing import batched_packed_hamming
from .topk import topk_slots

_BIG = jnp.int32(2**31 - 1)


def _resort_by_lex(slots, slot_ok, lex_rank):
    """Reorders a candidate slot array by id rank (invalid entries last)."""
    keys = jnp.where(slot_ok, lex_rank[slots], _BIG)
    keys, slots = jax.lax.sort((keys, slots), num_keys=1)
    return slots, keys < _BIG


def stage_full(x, valid, lex_order, q, *, metric, dims, count):
    """Stage over the full block: scores ``x[:, :dims]`` and selects the best
    ``count`` slots. Returns (slots_lex_sorted, slot_ok, all_finite)."""
    raw = batched_raw_scores(
        x[:, :dims], q[:dims], metric=metric, use_true_cosine=(metric == "cosine")
    )
    rank = rank_from_raw(raw, metric=metric)
    rank = jnp.where(valid, rank, jnp.inf)
    finite = jnp.all(jnp.isfinite(raw) | ~valid)
    slots, ranks = topk_slots(rank, lex_order, limit=count)
    lex_rank = jnp.zeros(x.shape[0], jnp.int32).at[lex_order].set(
        jnp.arange(x.shape[0], dtype=jnp.int32)
    )
    slots, ok = _resort_by_lex(slots, jnp.isfinite(ranks), lex_rank)
    return slots, ok, finite


def stage_subset(x, slots, slot_ok, q, lex_rank, *, metric, dims, count):
    """Stage over a candidate subset (slots sorted by id rank)."""
    rows = x[slots][:, :dims]
    raw = batched_raw_scores(
        rows, q[:dims], metric=metric, use_true_cosine=(metric == "cosine")
    )
    rank = rank_from_raw(raw, metric=metric)
    rank = jnp.where(slot_ok, rank, jnp.inf)
    finite = jnp.all(jnp.isfinite(raw) | ~slot_ok)
    k = min(count, slots.shape[0])
    neg, pos = jax.lax.top_k(-rank, k)
    sel = slots[pos]
    sel_ok = jnp.isfinite(-neg)
    sel, sel_ok = _resort_by_lex(sel, sel_ok, lex_rank)
    return sel, sel_ok, finite


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


def hamming_stage(bits, valid, lex_order, qbits, *, count):
    """Packed-Hamming candidate stage over the full block."""
    raw = batched_packed_hamming(bits, qbits)
    rank = jnp.where(valid, raw, jnp.inf)
    slots, ranks = topk_slots(rank, lex_order, limit=count)
    lex_rank = jnp.zeros(bits.shape[0], jnp.int32).at[lex_order].set(
        jnp.arange(bits.shape[0], dtype=jnp.int32)
    )
    slots, ok = _resort_by_lex(slots, jnp.isfinite(ranks), lex_rank)
    return slots, ok


@functools.partial(
    jax.jit, static_argnames=("metric", "stages", "count", "limit")
)
def funnel_pipeline(x, valid, lex_order, lex_rank, q, *, metric, stages, count, limit):
    """Matryoshka funnel: prefix stages then exact rerank, one dispatch."""
    slots, ok, finite = stage_full(x, valid, lex_order, q, metric=metric,
                                   dims=stages[0], count=count)
    for dims in stages[1:]:
        slots, ok, f = stage_subset(x, slots, ok, q, lex_rank, metric=metric,
                                    dims=dims, count=count)
        finite = finite & f
    top, raws, ranks, f = subset_rerank(x, slots, ok, q, metric=metric, limit=limit)
    return top, raws, ranks, finite & f


@functools.partial(jax.jit, static_argnames=("metric", "count", "limit"))
def quantized_pipeline(x, bits, valid, lex_order, q, qbits, *, metric, count, limit):
    """Binary-quantized candidates (sign-bit Hamming) then exact rerank."""
    slots, ok = hamming_stage(bits, valid, lex_order, qbits, count=count)
    top, raws, ranks, finite = subset_rerank(x, slots, ok, q, metric=metric, limit=limit)
    return top, raws, ranks, finite


@functools.partial(jax.jit, static_argnames=("metric", "stages", "count", "limit"))
def funnel_candidates_pipeline(x, valid, lex_order, lex_rank, q, *, metric, stages, count,
                               limit=None):
    """Funnel stages only (hybrid generator): returns lex-sorted candidates."""
    slots, ok, finite = stage_full(x, valid, lex_order, q, metric=metric,
                                   dims=stages[0], count=count)
    for dims in stages[1:]:
        slots, ok, f = stage_subset(x, slots, ok, q, lex_rank, metric=metric,
                                    dims=dims, count=count)
        finite = finite & f
    return slots, ok, finite


@functools.partial(jax.jit, static_argnames=("count",))
def quantized_candidates_pipeline(bits, valid, lex_order, qbits, *, count):
    """Hamming candidates only (hybrid generator)."""
    return hamming_stage(bits, valid, lex_order, qbits, count=count)


@functools.partial(jax.jit, static_argnames=("metric", "limit"))
def rerank_pipeline(x, slots, slot_ok, q, *, metric, limit):
    """Standalone exact rerank over an arbitrary candidate set."""
    return subset_rerank(x, slots, slot_ok, q, metric=metric, limit=limit)


# ---------------------------------------------------------------------------
# Batched variants: one dispatch for a whole query batch (serving path —
# per-query dispatches through a remote tunnel are RTT-bound)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "stages", "count", "limit"))
def funnel_pipeline_batch(x, valid, lex_order, lex_rank, queries, *, metric, stages,
                          count, limit):
    """Vmapped :func:`funnel_pipeline` over ``queries`` [B, d]."""

    def one(q):
        return funnel_pipeline(x, valid, lex_order, lex_rank, q, metric=metric,
                               stages=stages, count=count, limit=limit)

    return jax.vmap(one)(queries)


@functools.partial(jax.jit, static_argnames=("metric", "count", "limit"))
def quantized_pipeline_batch(x, bits, valid, lex_order, queries, qbits, *, metric,
                             count, limit):
    """Vmapped :func:`quantized_pipeline` over ``queries`` [B, d] and
    ``qbits`` [B, W]."""

    def one(q, qb):
        return quantized_pipeline(x, bits, valid, lex_order, q, qb, metric=metric,
                                  count=count, limit=limit)

    return jax.vmap(one)(queries, qbits)
