"""Fused Pallas MaxSim scan vs the XLA chunked oracle.

The fused path must match maxsim_full_topk_batch on f32 blocks exactly
(selection at HIGHEST precision) — ids, order, scores — including the edge
semantics the reference pins down: zero-token docs score 0.0, empty query
sets score everything 0.0, pads never contribute
(/root/reference/native/vettore/src/multi_vector.rs:44-60,101-111).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from vettore_tpu.ops import maxsim

RNG = np.random.default_rng(77)
CAP, T, D = 128, 4, 128


def block(n_real=100, zero_token_docs=(5, 17), dead=(9,)):
    tokens = RNG.standard_normal((CAP, T, D)).astype(np.float32)
    counts = RNG.integers(1, T + 1, CAP).astype(np.int32)
    counts[n_real:] = 0
    for i in zero_token_docs:
        counts[i] = 0
    # pad token rows zero (the cache contract)
    for i in range(CAP):
        tokens[i, counts[i]:] = 0.0
    valid = np.ones(CAP, bool)
    valid[n_real:] = False
    for i in dead:
        valid[i] = False
    return jnp.asarray(tokens), jnp.asarray(counts), jnp.asarray(valid)


def queries(b=3, qmax=2):
    qtok = RNG.standard_normal((b, qmax, D)).astype(np.float32)
    qmask = np.ones((b, qmax), bool)
    if b > 1:
        qmask[1, 1:] = False  # ragged query set
    qtok[~qmask] = 0.0
    return jnp.asarray(qtok), jnp.asarray(qmask)


@pytest.mark.parametrize("metric", ["cosine", "inner_product",
                                    "negative_inner_product"])
def test_fused_matches_xla_oracle(metric):
    tokens, counts, valid = block()
    qtok, qmask = queries()
    assert maxsim.supports_fused(metric, CAP, T, D,
                                 qtok.shape[0] * qtok.shape[1], 4)
    want_slots, want_scores, want_ok = maxsim.maxsim_full_topk_batch(
        tokens, counts, valid, qtok, qmask, metric=metric, limit=10, chunk=CAP)
    got_slots, got_scores, got_ok = maxsim.fused_maxsim_topk_batch(
        tokens, counts, valid, qtok, qmask, metric=metric, limit=10,
        t=T, b=int(qtok.shape[0]))
    assert np.asarray(got_ok).all() and np.asarray(want_ok).all()
    np.testing.assert_array_equal(np.asarray(got_slots), np.asarray(want_slots))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("metric", ["cosine", "inner_product"])
def test_uniform_variant_matches_xla_oracle(metric):
    """The operand-free uniform-token kernel (norms in-kernel, 1-D per-doc
    vectors — the only variant that compiles at 1M x 32 tokens) must agree
    with the XLA oracle on a full-token corpus."""
    tokens = jnp.asarray(RNG.standard_normal((CAP, T, D)).astype(np.float32))
    counts = jnp.asarray(np.where(np.arange(CAP) < 100, T, 0).astype(np.int32))
    valid = jnp.asarray(np.arange(CAP) < 100)
    qtok, qmask = queries()
    assert maxsim.supports_fused(metric, CAP, T, D,
                                 qtok.shape[0] * qtok.shape[1], 4,
                                 uniform=True)
    want_slots, want_scores, want_ok = maxsim.maxsim_full_topk_batch(
        tokens, counts, valid, qtok, qmask, metric=metric, limit=10, chunk=CAP)
    got_slots, got_scores, got_ok = maxsim.fused_maxsim_topk_batch(
        tokens, counts, valid, qtok, qmask, metric=metric, limit=10,
        t=T, b=int(qtok.shape[0]), uniform=True)
    assert np.asarray(got_ok).all() and np.asarray(want_ok).all()
    np.testing.assert_array_equal(np.asarray(got_slots), np.asarray(want_slots))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores),
                               rtol=1e-5, atol=1e-6)


def test_large_masked_configs_require_uniform():
    """Past ~4M token rows the masked variant's padded [NT, 1] operands
    exceed HBM; supports_fused must refuse unless the corpus is uniform."""
    big_cap = 1_048_576
    assert not maxsim.supports_fused("cosine", big_cap, 32, 128, 256, 2)
    assert maxsim.supports_fused("cosine", big_cap, 32, 128, 256, 2,
                                 uniform=True)


def test_zero_token_docs_score_zero_and_rank_by_slot():
    tokens, counts, valid = block(zero_token_docs=(0, 1, 2))
    qtok, qmask = queries(b=1, qmax=2)
    # force every real doc's score negative so the zero-token docs win
    qtok = -jnp.abs(qtok) * 0.0 - jnp.abs(qtok)
    slots, scores, ok = maxsim.fused_maxsim_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="inner_product", limit=5,
        t=T, b=1)
    want_slots, want_scores, _ = maxsim.maxsim_full_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="inner_product", limit=5,
        chunk=CAP)
    np.testing.assert_array_equal(np.asarray(slots), np.asarray(want_slots))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want_scores),
                               rtol=1e-6)


def test_empty_query_set_scores_all_zero():
    tokens, counts, valid = block()
    qtok = jnp.zeros((2, 2, D), jnp.float32)
    qmask = jnp.zeros((2, 2), bool)
    got_slots, got_scores, got_ok = maxsim.fused_maxsim_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="cosine", limit=4,
        t=T, b=2)
    want_slots, want_scores, _ = maxsim.maxsim_full_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="cosine", limit=4,
        chunk=CAP)
    np.testing.assert_array_equal(np.asarray(got_slots), np.asarray(want_slots))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores))
    assert np.allclose(np.asarray(got_scores), 0.0)


def test_dead_slots_never_returned():
    tokens, counts, valid = block(dead=(3, 4, 5))
    qtok, qmask = queries(b=2, qmax=2)
    slots, scores, ok = maxsim.fused_maxsim_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="cosine", limit=20,
        t=T, b=2)
    got = set(np.asarray(slots).ravel().tolist())
    assert not ({3, 4, 5} & got)


def test_bf16_storage_selection_recalls_f32_oracle():
    tokens, counts, valid = block()
    qtok, qmask = queries(b=2, qmax=2)
    want_slots, _ws, _ = maxsim.maxsim_full_topk_batch(
        tokens, counts, valid, qtok, qmask, metric="cosine", limit=10,
        chunk=CAP)
    tb = tokens.astype(jnp.bfloat16)
    got_slots, got_scores, ok = maxsim.fused_maxsim_topk_batch(
        tb, counts, valid, qtok, qmask, metric="cosine", limit=10,
        t=T, b=2)
    # bf16 storage: candidate sets overlap heavily (the flat bf16 posture)
    for g_row, w_row in zip(np.asarray(got_slots), np.asarray(want_slots)):
        overlap = len(set(g_row.tolist()) & set(w_row.tolist())) / 10
        assert overlap >= 0.8
