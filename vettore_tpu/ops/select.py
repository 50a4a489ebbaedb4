"""Exact batched top-C selection for large C — recursive group-min descent.

The adaptive pipelines (quantized candidates=500, funnel candidates=200,
hybrid generators) need the exact C best slots per query out of a [B, N]
score matrix. ``lax.top_k`` on TPU costs ~O(C·N) per query — 1.25 s for
C=500 over [512, 1M] — because it re-extracts per element of k. This module
selects the same exact set in ~O(N + C·N/G + C²·g) by descending through
group minima:

* level 1 reduces rows to 64-row group minima and keeps the best
  ``C + slack`` groups. Order-statistic bound (same argument as
  ops/flat_scan.py): the C smallest group-mins are C distinct elements, so
  the true C-th best score is <= the C-th smallest group-min ``m_C``; a
  group whose min exceeds ``m_C`` cannot hold a top-C element. All groups
  with min <= ``m_C`` fit in the selection unless more than ``slack`` tie at
  exactly ``m_C`` — detected and reported via ``ok`` (callers fall back to a
  host oracle, as for f32 overflow);
* level 2 repeats with 8-row groups over the gathered ~C·64 candidates;
* the final <= ~8·C survivors sort exactly by (score, lex id) —
  the reference's (rank, id) heap order (search.rs:23-29).

Measured [512, 1M] C=512 u16 keys on v5e: ~30 ms vs 1,248 ms lax.top_k —
and unlike ``approx_max_k`` (54 ms) the result is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: extra groups kept per level beyond C (boundary-tie absorption)
SLACK = 8

_BIG32 = 2**31 - 1


def _level(key, slots, c, group):
    """One group-min descent level. ``key`` [B, M] ascending-is-better with
    +inf padding, ``slots`` [B, M] int32 global slot per position (-1 pad).
    Returns (key' [B, C'·group], slots', ok) where C' = min(c+SLACK, M/group).
    """
    b, m = key.shape
    ng = m // group
    kg = key.reshape(b, ng, group)
    gmin = jnp.min(kg, axis=2)
    gsel = min(c + SLACK, ng)
    neg_top, gidx = jax.lax.top_k(-gmin, gsel)
    if gsel < ng and gsel >= c:
        mc = -neg_top[:, c - 1]
        ok = jnp.sum((gmin <= mc[:, None]).astype(jnp.int32), axis=1) <= gsel  # [B]
    else:
        ok = jnp.ones(b, bool)  # whole array selected: trivially exact
    key2 = jnp.take_along_axis(kg, gidx[:, :, None], axis=1).reshape(b, gsel * group)
    slots2 = jnp.take_along_axis(
        slots.reshape(b, ng, group), gidx[:, :, None], axis=1
    ).reshape(b, gsel * group)
    return key2, slots2, ok


@functools.partial(jax.jit, static_argnames=("c",))
def exact_top_c(key, lex_rank, *, c: int):
    """Exact batched top-C: ``key`` [B, N] f32 ascending-is-better (+inf =
    invalid), ``lex_rank`` [N] int32 id ranks. Returns
    ``(slots [B, C] i32, keys [B, C] f32, ok [B] bool)`` ordered by
    (key, lex id); surplus positions carry +inf key and slot -1. ``ok[b]``
    False = a tie spill exceeded the slack for that query — caller must use
    an exact fallback for it."""
    b, n = key.shape
    c_eff = min(c, n)
    slots = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    ok = jnp.ones(b, bool)
    cur_key, cur_slots = key, slots
    # descend while some group level still shrinks the problem
    while True:
        m = cur_key.shape[1]
        for group in (64, 8):
            shrunk = min(c_eff + SLACK, m // group) * group
            if m % group == 0 and shrunk < m and m // group > c_eff:
                cur_key, cur_slots, lvl_ok = _level(cur_key, cur_slots, c_eff, group)
                ok = ok & lvl_ok
                break
        else:
            break
    # exact (key, lex) order over the survivors; lex_rank None means slot
    # order IS id order (lex-sorted blocks)
    if lex_rank is None:
        lex = cur_slots
    else:
        lex = jnp.where(cur_slots >= 0, lex_rank[jnp.maximum(cur_slots, 0)], _BIG32)
    lex = jnp.where(jnp.isfinite(cur_key), lex, _BIG32)
    key_s, _, slot_s = jax.lax.sort((cur_key, lex, cur_slots), num_keys=2, dimension=1)
    out_k = key_s[:, :c_eff]
    out_s = jnp.where(jnp.isfinite(out_k), slot_s[:, :c_eff], -1)
    if c_eff < c:
        pad = c - c_eff
        out_k = jnp.pad(out_k, ((0, 0), (0, pad)), constant_values=jnp.inf)
        out_s = jnp.pad(out_s, ((0, 0), (0, pad)), constant_values=-1)
    return out_s, out_k, ok
