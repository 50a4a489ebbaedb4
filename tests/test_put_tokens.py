"""Bulk multi-vector ingest (put_tokens), ndarray-vectors records, the
grouped Hamming selection, and the device-to-device batch serving APIs."""

import numpy as np
import pytest

import jax.numpy as jnp

from vettore_tpu import errors as E
from vettore_tpu.collection import Collection
from vettore_tpu.ops import pipeline as pipe


def _tokens(n, t, d, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.standard_normal((n, t, d)).astype(np.float32)
    return toks


def test_put_tokens_matches_put_many():
    """put_tokens must be byte-identical to the per-record vectors path
    (collection.ex:1008-1017 mean + normalize-at-insert semantics)."""
    n, t, d = 300, 4, 16
    toks = _tokens(n, t, d)
    ids = [f"r-{i:04d}" for i in range(n)]

    a = Collection(name="a", dimensions=d, metric="cosine", index="flat")
    a.put_tokens(ids, toks)
    b = Collection(name="b", dimensions=d, metric="cosine", index="flat")
    b.put_many([{"id": id, "vectors": [list(row) for row in toks[i]]}
                for i, id in enumerate(ids)])

    for id in ids[:20]:
        ra, rb = a.get(id), b.get(id)
        assert np.array_equal(np.asarray(ra.vector), np.asarray(rb.vector))
        assert np.array_equal(
            np.asarray(ra.binary_vector, dtype=np.uint64),
            np.asarray(rb.binary_vector, dtype=np.uint64))
        assert np.array_equal(
            np.asarray(ra.vectors, np.float32),
            np.asarray(rb.vectors, np.float32))

    q = [list(r) for r in toks[7]]
    ha = a.multi_vector_search(q, limit=5)
    hb = b.multi_vector_search(q, limit=5)
    assert [(r.id, r.score) for r in ha] == [(r.id, r.score) for r in hb]

    sa = a.search(list(toks[3].mean(axis=0)), limit=5)
    sb = b.search(list(toks[3].mean(axis=0)), limit=5)
    assert [(r.id, r.score) for r in sa] == [(r.id, r.score) for r in sb]


def test_put_tokens_validation():
    col = Collection(name="v", dimensions=8, metric="l2", index="flat")
    with pytest.raises(E.DimensionMismatch):
        col.put_tokens(["a"], np.zeros((1, 2, 9), np.float32))
    with pytest.raises(E.InvalidMultiVector):
        col.put_tokens(["a"], np.zeros((1, 8), np.float32))
    with pytest.raises(E.InvalidVector):
        col.put_tokens(["a", "b"], np.zeros((1, 2, 8), np.float32))
    bad = np.zeros((1, 2, 8), np.float32)
    bad[0, 1, 3] = np.nan
    with pytest.raises(E.InvalidVector):
        col.put_tokens(["a"], bad)
    with pytest.raises(E.MissingId):
        col.put_tokens([""], np.zeros((1, 2, 8), np.float32))
    with pytest.raises(E.DuplicateId):
        col.put_tokens(["x", "x"], np.zeros((2, 2, 8), np.float32))
    assert col.count() == 0  # nothing leaked


def test_put_tokens_snapshot_roundtrip(tmp_path):
    n, t, d = 64, 3, 8
    toks = _tokens(n, t, d, seed=3)
    ids = [f"s-{i:03d}" for i in range(n)]
    col = Collection(name="snap", dimensions=d, metric="cosine", index="flat")
    col.put_tokens(ids, toks)
    before = col.multi_vector_search([list(r) for r in toks[5]], limit=4)
    path = str(tmp_path / "mv.snap")
    col.snapshot(path)
    from vettore_tpu.collection import load_snapshot
    loaded = load_snapshot(path)
    after = loaded.multi_vector_search([list(r) for r in toks[5]], limit=4)
    assert [(r.id, r.score) for r in before] == [(r.id, r.score) for r in after]


def test_cache_fast_token_block_matches_slow_path():
    n, t, d = 128, 2, 8
    toks = _tokens(n, t, d, seed=5)
    ids = [f"c-{i:03d}" for i in range(n)]
    fast = Collection(name="f", dimensions=d, metric="cosine", index="flat")
    fast.put_tokens(ids, toks)
    slow = Collection(name="s", dimensions=d, metric="cosine", index="flat")
    slow.put_many([{"id": id, "vectors": [list(row) for row in toks[i]]}
                   for i, id in enumerate(ids)])
    tf, cf = fast._scan_cache().multi_vectors()
    ts, cs = slow._scan_cache().multi_vectors()
    assert np.array_equal(np.asarray(cf), np.asarray(cs))
    assert np.array_equal(
        np.asarray(tf, np.float32), np.asarray(ts, np.float32))


def test_grouped_hamming_selection_exact(monkeypatch):
    """The group-cover path must equal the direct composite path on a
    heavily tied corpus (the regime that broke the float path)."""
    monkeypatch.setattr(pipe, "_GROUP_COVER_MIN", 1024)
    rng = np.random.default_rng(11)
    n, d, b, count = 4096, 32, 5, 64
    base = rng.integers(0, 2, (7, d)) * 2 - 1  # 7 patterns -> massive ties
    signs_np = base[rng.integers(0, 7, n)]
    signs = jnp.asarray(signs_np, dtype=jnp.int8)
    valid = jnp.asarray(np.arange(n) < n - 9)
    qs = pipe.query_signs(
        jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)))
    slots, ranks, ok = pipe._hamming_slots(signs, valid, qs, count=count, d=d)
    assert bool(np.asarray(ok).all())
    ham = (d - np.asarray(qs, np.int32) @ signs_np.astype(np.int32).T) // 2
    ham = np.where(np.asarray(valid)[None, :], ham, 10**9)
    for i in range(b):
        order = np.lexsort((np.arange(n), ham[i]))[:count]
        assert np.array_equal(np.asarray(slots)[i], order)
        assert np.array_equal(np.asarray(ranks)[i], ham[i][order])


def test_device_batch_apis_match_sync():
    rng = np.random.default_rng(2)
    n, d = 512, 24
    data = rng.standard_normal((n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    ids = [f"d-{i:04d}" for i in range(n)]
    col = Collection(name="dev", dimensions=d, metric="cosine", index="flat")
    col.put_matrix(ids, data)
    queries = data[rng.integers(0, n, 8)] + 0.05 * rng.standard_normal(
        (8, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    prepared = jnp.asarray(np.stack(
        [col.prepare_query(list(q)) for q in queries]).astype(np.float32))

    sync_q = col.quantized_search_batch(queries, limit=5, candidates=50)
    dev_q = col.results_from_device(col.quantized_search_batch_device(
        prepared, limit=5, candidates=50))
    assert [[(r.id, r.score) for r in row] for row in sync_q] == [
        [(r.id, r.score) for r in row] for row in dev_q]

    sync_f = col.funnel_search_batch(queries, limit=5, candidates=50,
                                     stages=[8, 16, 24])
    dev_f = col.results_from_device(col.funnel_search_batch_device(
        prepared, limit=5, candidates=50, stages=[8, 16, 24]))
    assert [[(r.id, r.score) for r in row] for row in sync_f] == [
        [(r.id, r.score) for r in row] for row in dev_f]


def test_results_from_device_marks_not_ok_rows():
    """Rows whose ok flag is False hydrate to None (the sync APIs reroute
    those to the host oracle; device-API callers own that decision)."""
    import jax.numpy as jnp

    n, d = 128, 8
    rng = np.random.default_rng(7)
    data = rng.standard_normal((n, d)).astype(np.float32)
    col = Collection(name="nok", dimensions=d, metric="cosine", index="flat")
    col.put_matrix([f"n-{i:03d}" for i in range(n)], data)
    out = col.quantized_search_batch_device(
        jnp.asarray(data[:3]), limit=4, candidates=16)
    top, raws, ranks, ok = out
    fake_ok = jnp.asarray([True, False, True])
    rows = col.results_from_device((top, raws, ranks, fake_ok))
    assert rows[1] is None
    assert rows[0] is not None and rows[0][0].id == "n-000"
    assert rows[2] is not None and rows[2][0].id == "n-002"


def test_device_batch_apis_on_mesh():
    """Device batch APIs route through the sharded pipelines on a mesh
    collection and agree with the sync APIs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "shard"))
    n, d = 256, 16
    data = np.random.default_rng(9).standard_normal((n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    col = Collection(name="mdev", dimensions=d, metric="cosine", index="flat",
                     mesh=mesh)
    col.put_matrix([f"m-{i:03d}" for i in range(n)], data)
    queries = data[:4]  # multiple of the data axis
    prepared = jnp.asarray(np.stack(
        [col.prepare_query(list(q)) for q in queries]).astype(np.float32))

    sync_q = col.quantized_search_batch(queries, limit=3, candidates=16)
    dev_q = col.results_from_device(col.quantized_search_batch_device(
        prepared, limit=3, candidates=16))
    assert [[r.id for r in row] for row in sync_q] == [
        [r.id for r in row] for row in dev_q]

    sync_f = col.funnel_search_batch(queries, limit=3, candidates=16,
                                     stages=[8, 16])
    dev_f = col.results_from_device(col.funnel_search_batch_device(
        prepared, limit=3, candidates=16, stages=[8, 16]))
    assert [[r.id for r in row] for row in sync_f] == [
        [r.id for r in row] for row in dev_f]
