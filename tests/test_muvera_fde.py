"""MUVERA FDE candidate generation for multi-vector search.

The device document encoder must agree with the bit-exact host encoder
(ops/muvera ≡ muvera.rs) up to f32 summation order, and the accelerated
``multi_vector_search(candidates=...)`` path must recall the exact MaxSim
scan's results on clustered corpora while preserving the reference's edge
semantics (empty query sets score 0.0, zero-token docs score 0.0,
multi_vector.rs:44-60,101-111).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu import errors as E
from vettore_tpu.ops import muvera as host_muvera
from vettore_tpu.ops import muvera_fde

RNG = np.random.default_rng(20_260_721)
D = 128


def _doc_sets(n=64, t_max=4):
    return [RNG.standard_normal((int(RNG.integers(1, t_max + 1)), D))
            .astype(np.float32) for _ in range(n)]


# ---------------------------------------------------------------------------
# device encoder vs host encoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfg_extra", [
    {},
    {"num_repetitions": 2, "num_simhash_projections": 3,
     "projection_dimension": 8},
    {"num_repetitions": 1, "num_simhash_projections": 0},   # single partition
    {"projection_dimension": D},                            # identity mode
    {"num_repetitions": 2, "final_projection_dimension": 96},  # count-sketch
])
def test_device_doc_encoder_matches_host(cfg_extra):
    docs = _doc_sets(24)
    cfg = muvera_fde.normalize_config(
        {**muvera_fde.default_config(D), **cfg_extra}, D)
    want = host_muvera.encode_documents([d.tolist() for d in docs], cfg)

    cap, t = 32, 4
    tokens = np.zeros((cap, t, D), np.float32)
    counts = np.zeros(cap, np.int32)
    for i, d_ in enumerate(docs):
        tokens[i, : len(d_)] = d_
        counts[i] = len(d_)
    got = np.asarray(muvera_fde.encode_documents_device(
        jnp.asarray(tokens), jnp.asarray(counts), cfg))
    w = muvera_fde.fde_width(cfg)
    assert got.shape == (cap, muvera_fde.padded_width(cfg))
    np.testing.assert_allclose(got[: len(docs), :w], want, rtol=2e-4, atol=2e-5)
    # padded columns and pad slots are exactly zero
    assert not got[:, w:].any()
    assert not got[len(docs):].any()


def test_device_encoder_chunking_is_seamless(monkeypatch):
    docs = _doc_sets(48)
    cfg = muvera_fde.normalize_config(
        {**muvera_fde.default_config(D), "num_repetitions": 2}, D)
    cap, t = 64, 4
    tokens = np.zeros((cap, t, D), np.float32)
    counts = np.zeros(cap, np.int32)
    for i, d_ in enumerate(docs):
        tokens[i, : len(d_)] = d_
        counts[i] = len(d_)
    whole = np.asarray(muvera_fde.encode_documents_device(
        jnp.asarray(tokens), jnp.asarray(counts), cfg))
    monkeypatch.setattr(muvera_fde, "_ENC_CHUNK", 24)  # forces head + tail
    chunked = np.asarray(muvera_fde.encode_documents_device(
        jnp.asarray(tokens), jnp.asarray(counts), cfg))
    np.testing.assert_array_equal(whole, chunked)


def test_zero_token_docs_encode_to_zero():
    cfg = muvera_fde.normalize_config(muvera_fde.default_config(D), D)
    tokens = jnp.asarray(RNG.standard_normal((8, 2, D)).astype(np.float32))
    counts = jnp.asarray(np.array([2, 0, 1, 0, 2, 2, 0, 1], np.int32))
    out = np.asarray(muvera_fde.encode_documents_device(tokens, counts, cfg))
    assert not out[1].any() and not out[3].any() and not out[6].any()
    assert out[0].any() and out[2].any()


# ---------------------------------------------------------------------------
# collection-level accelerated search
# ---------------------------------------------------------------------------


def _mv_collection(n=192, t=4, centers=12, name="fde"):
    col = vt.Collection(name=name, dimensions=D, metric="cosine")
    cdirs = RNG.standard_normal((centers, D)).astype(np.float32)
    cdirs /= np.linalg.norm(cdirs, axis=1, keepdims=True)
    docs = []
    for i in range(n):
        c = cdirs[i % centers]
        toks = c[None, :] + 0.15 * RNG.standard_normal(
            (int(RNG.integers(1, t + 1)), D)).astype(np.float32)
        docs.append(toks)
    col.put_many([
        {"id": f"doc-{i:04d}", "vectors": toks.tolist()}
        for i, toks in enumerate(docs)
    ])
    return col, cdirs


def test_candidates_search_recalls_exact_scan():
    col, cdirs = _mv_collection()
    hits = 0
    for c in range(6):
        q = [list(cdirs[c] + 0.1 * RNG.standard_normal(D)) for _ in range(2)]
        exact = [r.id for r in col.multi_vector_search(q, limit=10)]
        fast = [r.id for r in col.multi_vector_search(q, limit=10,
                                                      candidates=64)]
        hits += len(set(exact) & set(fast))
    assert hits / 60 >= 0.9
    # scores of agreeing hits are the storage-exact MaxSim values
    q = [list(cdirs[0] + 0.1 * RNG.standard_normal(D))]
    exact = {r.id: r.score for r in col.multi_vector_search(q, limit=10)}
    for r in col.multi_vector_search(q, limit=10, candidates=64):
        if r.id in exact:
            assert abs(r.score - exact[r.id]) < 1e-5


def test_candidates_at_or_above_n_equals_exact():
    col, cdirs = _mv_collection(n=40, name="fde-all")
    q = [list(cdirs[1] + 0.1 * RNG.standard_normal(D)) for _ in range(2)]
    exact = [(r.id, r.score) for r in col.multi_vector_search(q, limit=10)]
    # candidates >= n falls through to the exact scan by definition
    allc = [(r.id, r.score) for r in col.multi_vector_search(
        q, limit=10, candidates=40)]
    assert exact == allc


def test_batch_candidates_matches_singles():
    col, cdirs = _mv_collection(n=96, name="fde-batch")
    qsets = [[list(cdirs[c] + 0.1 * RNG.standard_normal(D))] for c in range(4)]
    singles = [[r.id for r in col.multi_vector_search(qs, limit=5,
                                                      candidates=64)]
               for qs in qsets]
    batched = [[r.id for r in row] for row in col.multi_vector_search_batch(
        qsets, limit=5, candidates=64)]
    assert singles == batched


def test_empty_query_set_rejected_like_exact_path():
    col, _ = _mv_collection(n=40, name="fde-empty")
    # the collection boundary rejects empty query sets on the exact path
    # (query side must be non-empty, collection.ex:311-323); the accelerated
    # path keeps the same contract
    with pytest.raises(E.InvalidMultiVector):
        col.multi_vector_search_batch([[]], limit=4)
    with pytest.raises(E.InvalidMultiVector):
        col.multi_vector_search_batch([[]], limit=4, candidates=16)


def test_zero_token_docs_can_surface():
    col = vt.Collection(name="fde-zt", dimensions=D, metric="inner_product")
    rows = RNG.standard_normal((30, 2, D)).astype(np.float32)
    col.put_many([
        {"id": f"d-{i:02d}", "vectors": (-np.abs(rows[i])).tolist()}
        for i in range(30)
    ])
    # a doc whose tokens are all negative scores < 0 against a positive
    # query; give one doc an explicitly empty token set via primary vector
    col.put({"id": "zz-empty", "vector": list(-np.abs(
        RNG.standard_normal(D).astype(np.float32)))})
    q = [list(np.abs(RNG.standard_normal(D)))]
    fast = col.multi_vector_search(q, limit=31, candidates=16)
    assert all(np.isfinite(r.score) for r in fast)


def test_custom_muvera_config_and_errors():
    col, cdirs = _mv_collection(n=48, name="fde-cfg")
    q = [list(cdirs[0])]
    res = col.multi_vector_search(
        q, limit=5, candidates=32,
        muvera={"num_repetitions": 2, "num_simhash_projections": 3,
                "projection_dimension": 8})
    assert len(res) == 5
    with pytest.raises(E.InvalidCandidates):
        col.multi_vector_search(q, limit=5, candidates=0)
    with pytest.raises(E.InvalidCandidates):
        col.multi_vector_search(q, limit=5, candidates=True)
    with pytest.raises(E.InvalidMuveraConfig):
        col.multi_vector_search(q, limit=5, muvera={"num_repetitions": 2})
    with pytest.raises(E.InvalidMuveraConfig):
        col.multi_vector_search(q, limit=5, candidates=16, metric="l2")
    with pytest.raises(E.InvalidMuveraConfig):
        col.multi_vector_search(q, limit=5, candidates=16,
                                muvera={"bogus": 1})


def test_fde_block_rebuilds_after_mutation():
    col, cdirs = _mv_collection(n=48, name="fde-mut")
    q = [list(cdirs[2])]
    before = [r.id for r in col.multi_vector_search(q, limit=5, candidates=32)]
    assert before
    spike = cdirs[2][None, :] * 2.0
    col.put({"id": "aaa-new", "vectors": spike.tolist()})
    after = col.multi_vector_search(q, limit=5, candidates=32)
    assert after[0].id == "aaa-new"
    col.delete("aaa-new")
    again = [r.id for r in col.multi_vector_search(q, limit=5, candidates=32)]
    assert again == before


def test_query_fde_is_bit_exact_public_encoder():
    cfg = muvera_fde.normalize_config(muvera_fde.default_config(D), D)
    qs = RNG.standard_normal((3, D)).astype(np.float32)
    got = muvera_fde.encode_query_sets_host([qs], cfg)[0]
    want = np.asarray(host_muvera.encode_query(
        np.asarray(qs, np.float64), cfg), np.float32)
    w = muvera_fde.fde_width(cfg)
    np.testing.assert_array_equal(got[:w], want)
    assert not got[w:].any()
