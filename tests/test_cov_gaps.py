"""Targeted coverage of paths the scenario suites skirt: the IVF
device-to-device serving path with a pending tail (the bench-only route),
from_flat wrapping, and validation raises."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vettore_tpu.errors import DimensionMismatch, InvalidVector
from vettore_tpu.index.flat import FlatIndex
from vettore_tpu.index.ivf import IvfIndex


def _corpus(n=6000, d=16, seed=2):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(40, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    rows = c[rng.integers(0, 40, n)] + 0.05 * rng.normal(size=(n, d)).astype(
        np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows


@pytest.fixture(scope="module")
def built_ivf():
    data = _corpus()
    ids = [f"doc-{i:05d}" for i in range(len(data))]
    flat = FlatIndex("cosine")
    flat.put_matrix(ids, data)
    ivf = IvfIndex.from_flat(flat, {"n_probe": 8})
    ivf.rebuild()
    return ivf, ids, data


def test_from_flat_shares_mirror(built_ivf):
    ivf, ids, data = built_ivf
    assert len(ivf) == len(ids)
    assert ivf.dimension == data.shape[1]
    assert ivf.built


def test_device_search_matches_host_path(built_ivf):
    ivf, ids, data = built_ivf
    q = data[:4]
    host = ivf.search_batch(q.astype(np.float64), 5)
    slots, raws = ivf.search_batch_device(jnp.asarray(q), 5)
    vocab = ivf.ids_by_slot()
    slots_np, raws_np = np.asarray(slots), np.asarray(raws)
    for b, row in enumerate(host):
        got = [(vocab[int(s)], float(r))
               for s, r in zip(slots_np[b], raws_np[b]) if s >= 0]
        assert [g[0] for g in got[: len(row)]] == [h[0] for h in row]


def test_device_search_merges_pending_tail(built_ivf):
    ivf, ids, data = built_ivf
    probe = data[7] / np.linalg.norm(data[7])
    ivf.put("zz-tail-hit", probe)  # tail row, not in the built block
    try:
        q = probe[None, :].astype(np.float32)
        host = ivf.search_batch(q.astype(np.float64), 3)
        assert host[0][0][0] == "zz-tail-hit"
        slots, raws = ivf.search_batch_device(jnp.asarray(q), 3)
        vocab = ivf.ids_by_slot()
        top = vocab[int(np.asarray(slots)[0, 0])]
        assert top == "zz-tail-hit"  # merge_with_tail surfaced the tail row
    finally:
        ivf.delete("zz-tail-hit")  # also walks the tail-delete path
    assert len(ivf) == len(ids)


def test_query_validation_raises(built_ivf):
    ivf, _ids, data = built_ivf
    with pytest.raises(InvalidVector):
        ivf.search_batch(np.ones((2, 2, 2)), 3)
    with pytest.raises(DimensionMismatch):
        ivf.search_batch(np.ones((1, data.shape[1] + 3)), 3)
    bad = np.ones((1, data.shape[1]))
    bad[0, 0] = np.inf
    with pytest.raises(InvalidVector):
        ivf.search_batch(bad, 3)
