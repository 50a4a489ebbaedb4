"""Cluster-blocked kNN bulk construction (hnsw_knn_build.py).

The kNN build must produce the same BulkGraph contract as the wave build:
deterministic levels/tie-breaks, valid adjacency (no self/dup/dangling
edges, degree caps), device-search recall against the exact oracle, and
interop with save/load and the wave-kernel incremental mutation path.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vettore_tpu.errors import InvalidHnswOptions
from vettore_tpu.index import hnsw_build, hnsw_knn_build
from vettore_tpu.index.hnsw import HnswIndex, validate_options

OPTS = {"m": 4, "m0": 8, "ef_construction": 32, "ef_search": 64,
        "build": "knn"}


def _clustered(n, d, centers, seed):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    rows = c[rng.integers(0, centers, n)] + (0.25 / np.sqrt(d)) * rng.normal(
        size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows


@pytest.fixture(scope="module")
def small_buckets():
    """Shrink the capacity-bucket floor and probe count so the k-means path
    runs (and compiles fast) at test scale."""
    saved = (hnsw_knn_build.MIN_NGB, hnsw_knn_build.PROBES,
             hnsw_knn_build.CHUNK_BLOCKS)
    hnsw_knn_build.MIN_NGB = 4
    hnsw_knn_build.PROBES = 4
    hnsw_knn_build.CHUNK_BLOCKS = 8
    yield
    (hnsw_knn_build.MIN_NGB, hnsw_knn_build.PROBES,
     hnsw_knn_build.CHUNK_BLOCKS) = saved


@pytest.fixture(scope="module")
def built(small_buckets):
    n, d = 640, 16
    data = _clustered(n, d, 24, seed=5)
    ids = [f"id-{i:05d}" for i in range(n)]
    idx = HnswIndex("cosine", OPTS)
    idx.BULK_THRESHOLD = 2
    idx.put_many(zip(ids, data))
    assert idx._bulk is not None
    return idx, ids, data


class TestKnnGraphQuality:
    def test_recall_vs_exact(self, built):
        idx, ids, data = built
        rng = np.random.default_rng(11)
        q = data[:128] + 0.03 * rng.normal(size=(128, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        gt = np.argsort(-(q @ data.T), axis=1)[:, :10]
        hits = idx.search_batch(q.astype(np.float64), 10)
        rec = np.mean([
            len({h[0] for h in row} & {ids[j] for j in gt[i]}) / 10
            for i, row in enumerate(hits)
        ])
        assert rec >= 0.9

    def test_adjacency_invariants(self, built):
        idx, _ids, _data = built
        g = idx._bulk
        n = g.n
        a0 = np.asarray(g.a0)
        assert a0.shape == (n, g.m0)
        for i in range(n):
            row = a0[i][a0[i] >= 0]
            assert len(set(row.tolist())) == len(row)  # no dup edges
            assert i not in row.tolist()  # no self edges
            assert (row < n).all() and (row >= 0).all()
        up = np.asarray(g.up_adj)
        for u in range(up.shape[0]):
            for l in range(up.shape[1]):
                row = up[u, l][up[u, l] >= 0]
                assert len(set(row.tolist())) == len(row)
                assert u not in row.tolist()  # up row index == slot
                assert (row < n).all()

    def test_upper_layer_nodes_are_prefix(self, built):
        idx, _ids, _data = built
        g = idx._bulk
        levels = np.asarray(g.levels)
        assert (np.diff(levels) <= 0).all()  # level-descending slot order
        up_index = np.asarray(g.up_index)
        cap_up = int((levels >= 1).sum())
        np.testing.assert_array_equal(up_index[:cap_up],
                                      np.arange(cap_up, dtype=np.int32))
        assert (up_index[cap_up:] == -1).all()

    def test_deterministic(self, built):
        idx, ids, data = built
        idx2 = HnswIndex("cosine", OPTS)
        idx2.BULK_THRESHOLD = 2
        idx2.put_many(zip(ids, data))
        np.testing.assert_array_equal(np.asarray(idx._bulk.a0),
                                      np.asarray(idx2._bulk.a0))
        np.testing.assert_array_equal(np.asarray(idx._bulk.up_adj),
                                      np.asarray(idx2._bulk.up_adj))
        assert int(idx._bulk.entry_slot) == int(idx2._bulk.entry_slot)

    def test_result_order_rank_ascending(self, built):
        idx, _ids, data = built
        hits = idx.search(np.asarray(data[7], np.float64), 10)
        ranks = [1.0 - raw for _id, raw in hits]
        assert all(a <= b + 1e-9 for a, b in zip(ranks, ranks[1:]))
        assert hits[0][0] == "id-00007"  # self row wins


class TestKnnInterop:
    def test_save_load_round_trip(self, built, tmp_path):
        idx, _ids, data = built
        path = str(tmp_path / "knn.npz")
        idx.save_graph(path)
        loaded = HnswIndex.load_graph("cosine", OPTS, path)
        a = idx.search(np.asarray(data[3], np.float64), 5)
        b = loaded.search(np.asarray(data[3], np.float64), 5)
        assert a == b

    def test_incremental_put_on_knn_graph(self, built):
        idx, ids, data = built
        v = data[0] * -1.0
        idx.put("zz-new", v)
        assert idx._bulk is not None
        assert len(idx) == len(ids) + 1
        hits = [h[0] for h in idx.search(np.asarray(v, np.float64), 1)]
        assert hits == ["zz-new"]
        idx.delete("zz-new")
        assert len(idx) == len(ids)

    def test_l2_metric_build(self, small_buckets):
        n, d = 320, 16
        data = _clustered(n, d, 12, seed=9)
        ids = [f"l2-{i:04d}" for i in range(n)]
        idx = HnswIndex("l2", OPTS)
        idx.BULK_THRESHOLD = 2
        idx.put_many(zip(ids, data))
        gt = np.argsort(np.linalg.norm(data - data[5], axis=1))[:5]
        hits = [h[0] for h in idx.search(np.asarray(data[5], np.float64), 5)]
        assert set(hits) & {ids[j] for j in gt} >= {ids[5]}
        assert len(set(hits) & {ids[j] for j in gt}) >= 4


class TestBuildDispatch:
    def test_invalid_build_mode_rejected(self):
        with pytest.raises(InvalidHnswOptions):
            validate_options({"build": "magic"})

    def test_auto_routes_by_scale(self, monkeypatch, small_buckets):
        calls = {"knn": 0}
        real = hnsw_knn_build.bulk_build_knn

        def spy(*a, **k):
            calls["knn"] += 1
            return real(*a, **k)

        monkeypatch.setattr(hnsw_knn_build, "bulk_build_knn", spy)
        monkeypatch.setattr(hnsw_build, "KNN_BUILD_MIN", 64)
        data = _clustered(128, 16, 8, seed=3)
        idx = HnswIndex("cosine", {"m": 4, "m0": 8, "ef_construction": 32,
                                   "ef_search": 32})
        idx.BULK_THRESHOLD = 2
        idx.put_many((f"a-{i:04d}", v) for i, v in enumerate(data))
        assert calls["knn"] == 1
        # below the threshold auto stays on the wave build
        idx2 = HnswIndex("cosine", {"m": 4, "m0": 8, "ef_construction": 32,
                                    "ef_search": 32})
        idx2.BULK_THRESHOLD = 2
        idx2.put_many((f"b-{i:04d}", v) for i, v in enumerate(data[:32]))
        assert calls["knn"] == 1
