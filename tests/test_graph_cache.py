"""Bulk-graph serialization: save/load round-trip, shared device block,
and search parity (hnsw_build.save_graph/load_graph)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vettore_tpu.errors import UnsupportedHnswMetric, VettoreError
from vettore_tpu.index import hnsw_build
from vettore_tpu.index.hnsw import HnswIndex


def _bulk_index(n=96, d=16, metric="cosine", seed=7):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    idx = HnswIndex(metric, {"m": 4, "m0": 8, "ef_construction": 32, "ef_search": 32})
    idx.BULK_THRESHOLD = 2
    idx.put_many((f"id-{i:04d}", v) for i, v in enumerate(data))
    assert idx._bulk is not None
    return idx, data


class TestGraphSaveLoad:
    def test_round_trip_arrays(self, tmp_path):
        idx, _ = _bulk_index()
        path = str(tmp_path / "g.npz")
        idx.save_graph(path)
        loaded = hnsw_build.load_graph(path)
        g = idx._bulk
        assert loaded.ids == g.ids
        assert (loaded.n, loaded.m, loaded.m0, loaded.lmax) == (g.n, g.m, g.m0, g.lmax)
        assert loaded.metric == g.metric
        np.testing.assert_array_equal(np.asarray(loaded.a0), np.asarray(g.a0))
        np.testing.assert_array_equal(np.asarray(loaded.up_adj), np.asarray(g.up_adj))
        np.testing.assert_array_equal(np.asarray(loaded.up_index), np.asarray(g.up_index))
        np.testing.assert_array_equal(np.asarray(loaded.lex_rank), np.asarray(g.lex_rank))
        np.testing.assert_array_equal(np.asarray(loaded.x), np.asarray(g.x))
        np.testing.assert_array_equal(np.asarray(loaded.levels), np.asarray(g.levels))
        assert int(loaded.entry_slot) == int(g.entry_slot)
        assert int(loaded.entry_level) == int(g.entry_level)

    def test_loaded_index_search_parity(self, tmp_path):
        idx, data = _bulk_index()
        path = str(tmp_path / "g.npz")
        idx.save_graph(path)
        loaded = HnswIndex.load_graph(
            "cosine", {"m": 4, "m0": 8, "ef_construction": 32, "ef_search": 32}, path
        )
        assert len(loaded) == len(idx)
        queries = data[:8] + 0.01
        for q in queries:
            a = idx.search(q, 5)
            b = loaded.search(q, 5)
            assert a == b

    def test_load_with_shared_device_block(self, tmp_path):
        idx, _ = _bulk_index()
        path = str(tmp_path / "g.npz")
        idx.save_graph(path, include_x=False)
        x_dev = idx._bulk.x
        loaded = HnswIndex.load_graph(
            "cosine", {"m": 4, "m0": 8, "ef_construction": 32, "ef_search": 32},
            path, x_device=x_dev,
        )
        assert loaded._bulk.x is x_dev
        q = np.asarray(x_dev[3], np.float64)
        assert loaded.search(q, 3) == idx.search(q, 3)

    def test_load_without_x_rejected(self, tmp_path):
        idx, _ = _bulk_index()
        path = str(tmp_path / "g.npz")
        idx.save_graph(path, include_x=False)
        with pytest.raises(ValueError):
            hnsw_build.load_graph(path)

    def test_metric_mismatch_rejected(self, tmp_path):
        idx, _ = _bulk_index()
        path = str(tmp_path / "g.npz")
        idx.save_graph(path)
        with pytest.raises(UnsupportedHnswMetric):
            HnswIndex.load_graph("l2", {"m": 4, "m0": 8}, path)

    def test_non_bulk_graph_rejected(self, tmp_path):
        idx = HnswIndex("cosine", {"m": 4, "m0": 8})
        idx.put("only", [1.0, 0.0])
        with pytest.raises(VettoreError):
            idx.save_graph(str(tmp_path / "g.npz"))

    def test_loaded_graph_mutable_after_hydrate(self, tmp_path):
        idx, data = _bulk_index(n=48)
        path = str(tmp_path / "g.npz")
        idx.save_graph(path)
        loaded = HnswIndex.load_graph(
            "cosine", {"m": 4, "m0": 8, "ef_construction": 32, "ef_search": 32}, path
        )
        loaded.put("zz-new", list(data[0]))
        assert len(loaded) == 49
        hits = loaded.search(data[0], 2)
        assert "zz-new" in {h[0] for h in hits}
