"""HNSW tests mirroring the reference graph suite (hnsw.rs:509-795):
parameter validation, reachability, atomic batches, high-ef exactness,
self-recall, graph invariants, deterministic entry re-election and levels —
plus device-kernel vs host-graph parity."""

import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu import errors
from vettore_tpu.index.hnsw import HnswIndex, fnv1a_64, level_for

PARAMS = {"m": 8, "m0": 16, "ef_construction": 200, "ef_search": 200, "max_level": 12}


class TestParams:
    def test_validates_parameters(self):
        HnswIndex("l2", PARAMS)
        for invalid in [
            {"m": 0},
            {"m0": 0},
            {"m": 1025, "m0": 2048},
            {"m0": 2049},
            {"m0": 4},
            {"ef_construction": 4},
            {"ef_construction": 1_000_001},
            {"ef_search": 0},
            {"ef_search": 1_000_001},
            {"max_level": 0},
            {"max_level": 65},
            {"bogus": 3},
        ]:
            with pytest.raises(errors.InvalidHnswOptions):
                HnswIndex("l2", {**PARAMS, **invalid})
        with pytest.raises(errors.UnsupportedHnswMetric):
            HnswIndex("manhattan", PARAMS)
        assert HnswIndex("euclidean", PARAMS).metric == "l2"

    def test_defaults(self):
        index = HnswIndex("cosine")
        assert index.params["m"] == 16
        assert index.params["m0"] == 32
        assert index.params["ef_construction"] == 100
        assert index.params["ef_search"] == 64
        assert index.params["max_level"] == 12


class TestGraph:
    def test_every_inserted_node_remains_reachable(self):
        index = HnswIndex("l2", PARAMS)
        index.put_many((f"{v:03d}", [float(v)]) for v in range(100))
        hits = index.search([99.0], 100)
        assert len(hits) == 100
        assert len({id for id, _ in hits}) == 100
        for v in range(100):
            assert index.search([float(v)], 1)[0][0] == f"{v:03d}"

    def test_batch_atomicity_replace_delete(self):
        index = HnswIndex("inner_product", PARAMS)
        index.put("a", [1.0, 0.0])
        with pytest.raises(errors.DimensionMismatch):
            index.put_many([("b", [0.0, 1.0]), ("bad", [1.0])])
        assert len(index) == 1
        index.put("a", [0.0, 1.0])
        assert index.search([0.0, 1.0], 1)[0][0] == "a"
        index.delete("a")
        assert index.search([0.0, 1.0], 1) == []
        assert index.dimension is None

    def test_rejects_non_finite_and_mismatched(self):
        index = HnswIndex("cosine", PARAMS)
        with pytest.raises(errors.InvalidVector):
            index.put("empty", [])
        index.put("a", [1.0, 0.0])
        with pytest.raises(errors.DimensionMismatch):
            index.put("short", [1.0])
        with pytest.raises(errors.InvalidVector):
            index.put("nan", [float("nan"), 0.0])
        with pytest.raises(errors.DimensionMismatch):
            index.search([1.0], 1)
        with pytest.raises(errors.InvalidVector):
            index.search([float("inf"), 0.0], 1)

    def test_empty_and_limit_zero(self):
        index = HnswIndex("l2", PARAMS)
        assert index.search([1.0], 10) == []
        index.put("a", [0.0])
        assert index.search([0.0], 0) == []

    def test_high_ef_matches_exact_l2_on_grid(self):
        index = HnswIndex("l2", PARAMS)
        pairs = [
            (f"{x:02d}-{y:02d}", [float(x), float(y)])
            for x in range(15)
            for y in range(15)
        ]
        index.put_many(pairs)
        for query in ([0.25, 0.75], [7.2, 8.6], [14.0, 14.0], [-3.0, 20.0]):
            expected = sorted(
                ((float(np.linalg.norm(np.array(query) - np.array(v))), id) for id, v in pairs),
                key=lambda h: (h[0], h[1]),
            )[:20]
            got = index.search(query, 20)
            assert [g[0] for g in got] == [id for _, id in expected]
            for (_, graw), (edist, _) in zip(got, expected):
                assert abs(graw - edist) < 1e-5

    def test_unit_circle_self_recall(self):
        pairs = [
            (f"unit-{i:02d}", [float(np.cos(a)), float(np.sin(a))])
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 64, endpoint=False))
        ]
        for metric in ("cosine", "inner_product"):
            index = HnswIndex(metric, PARAMS)
            index.put_many(pairs)
            for id, v in pairs:
                assert index.search(v, 1)[0][0] == id

    def test_degrees_and_references_well_formed(self):
        index = HnswIndex("l2", PARAMS)
        index.put_many(
            (
                f"node-{v:03d}",
                [float(np.sin(v)), float(np.cos(v)), v / 300.0],
            )
            for v in range(300)
        )
        for internal, conns in index._connections.items():
            for layer, neighbors in enumerate(conns):
                limit = index.params["m0"] if layer == 0 else index.params["m"]
                assert len(neighbors) <= limit
                assert len(set(neighbors)) == len(neighbors)
                assert internal not in neighbors
                assert all(n in index._vectors for n in neighbors)
        hits = index.search([0.0, 1.0, 0.5], 1000)
        assert len(hits) == 300
        assert len({id for id, _ in hits}) == 300

    def test_entry_reelection_deterministic(self):
        index = HnswIndex("l2", PARAMS)
        index.put_many((f"id-{v:02d}", [float(v)]) for v in range(80))
        old_entry = index._entry
        old_id = index._external[old_entry]
        index.delete("missing")
        assert index._entry == old_entry
        index.delete(old_id)
        expected = min(
            index._levels, key=lambda i: (-index._levels[i], index._external[i])
        )
        assert index._entry == expected

    def test_deterministic_levels(self):
        a = HnswIndex("l2", PARAMS)
        b = HnswIndex("l2", PARAMS)
        for id in ["a", "b", "stable-id", "another-id", "\0"]:
            assert level_for(id, 12) == level_for(id, 12)
            assert level_for(id, 12) <= 12
            assert fnv1a_64(id.encode()) == fnv1a_64(id.encode())
        # spot-check the FNV-1a constant behaviour on a known value
        assert fnv1a_64(b"") == 0xCBF29CE484222325


class TestDeviceParity:
    def test_device_matches_host(self):
        from vettore_tpu.index import hnsw_device

        rng = np.random.default_rng(11)
        n, d = 400, 24
        data = rng.normal(size=(n, d)).astype(np.float64)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        index = HnswIndex("cosine", {"m": 8, "m0": 16, "ef_construction": 80,
                                     "ef_search": 64, "max_level": 12})
        index.put_many((f"doc-{i:03d}", list(data[i])) for i in range(n))

        queries = data[rng.integers(0, n, 16)]
        device = hnsw_device.search(index, queries, 10)
        overlaps = []
        for q, dev_hits in zip(queries, device):
            host_hits = index._search_host(q, 10)
            dev_ids = [h[0] for h in dev_hits]
            host_ids = [h[0] for h in host_hits]
            overlaps.append(len(set(dev_ids) & set(host_ids)) / 10)
            # self-hit must match exactly
            assert dev_ids[0] == host_ids[0]
        assert np.mean(overlaps) >= 0.95

    def test_device_self_recall(self):
        from vettore_tpu.index import hnsw_device

        rng = np.random.default_rng(2)
        n, d = 300, 8
        data = rng.normal(size=(n, d))
        index = HnswIndex("l2", PARAMS)
        index.put_many((f"v-{i:03d}", list(data[i])) for i in range(n))
        hits = hnsw_device.search(index, data[:32], 1)
        for i, row in enumerate(hits):
            assert row[0][0] == f"v-{i:03d}"


class TestCollectionIntegration:
    def test_hnsw_collection_search(self):
        rng = np.random.default_rng(5)
        data = rng.normal(size=(60, 12))
        col = vt.Collection(dimensions=12, metric="cosine", index="hnsw",
                            index_options={"m": 8, "m0": 16, "ef_construction": 60,
                                           "ef_search": 60})
        col.put_many([{"id": f"doc-{i:02d}", "vector": list(data[i])} for i in range(60)])
        results = col.search(list(data[9]), limit=5)
        assert results[0].id == "doc-09"
        assert abs(results[0].score - 1.0) < 1e-5

    def test_hnsw_hybrid_generator(self):
        rng = np.random.default_rng(6)
        data = rng.normal(size=(50, 8))
        col = vt.Collection(dimensions=8, metric="cosine", index="hnsw")
        col.put_many([{"id": f"doc-{i:02d}", "vector": list(data[i])} for i in range(50)])
        results = col.hybrid_search(list(data[21]), limit=5)  # default [hnsw, quantized]
        assert results[0].id == "doc-21"

    def test_snapshot_index_override(self, tmp_path):
        rng = np.random.default_rng(7)
        data = rng.normal(size=(30, 6))
        col = vt.Collection(dimensions=6, metric="cosine", index="flat")
        col.put_many([{"id": f"doc-{i:02d}", "vector": list(data[i])} for i in range(30)])
        path = str(tmp_path / "c.snap")
        col.snapshot(path)
        loaded = vt.load_snapshot(path, index="hnsw")
        assert loaded.index_kind == "hnsw"
        results = loaded.search(list(data[4]), limit=3)
        assert results[0].id == "doc-04"
        # override persists through re-snapshot
        path2 = str(tmp_path / "c2.snap")
        loaded.snapshot(path2)
        assert vt.load_snapshot(path2).index_kind == "hnsw"

    def test_unsupported_hnsw_metric_in_collection(self):
        with pytest.raises(errors.UnsupportedHnswMetric):
            vt.Collection(dimensions=4, metric="manhattan", index="hnsw")


def test_expand_w_option_validation_and_search():
    import numpy as np

    from vettore_tpu.index.hnsw import HnswIndex, InvalidHnswOptions

    with np.errstate(all="ignore"):
        rng = np.random.default_rng(40)
        data = rng.standard_normal((64, 8)).astype(np.float32)
    idx = HnswIndex("l2", {"ef_search": 16, "expand_w": 2})
    idx.put_many([(f"w-{i:02d}", data[i]) for i in range(64)])
    hits = idx.search(list(data[9]), 3)
    assert hits[0][0] == "w-09"

    import pytest

    for bad in (0, -1, 257, "x"):
        with pytest.raises(InvalidHnswOptions):
            HnswIndex("l2", {"expand_w": bad})


def test_greedy_descent_without_hub_seeding():
    """The hub-less branch (greedy upper-layer descent, hnsw.rs:302-372)
    must find the same neighbors as the hub-seeded default."""
    import numpy as np

    from vettore_tpu.index import hnsw_device
    from vettore_tpu.index.hnsw import HnswIndex

    rng = np.random.default_rng(41)
    data = rng.standard_normal((256, 16)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    idx = HnswIndex("cosine", {"ef_search": 32})
    idx.put_many([(f"g-{i:03d}", data[i]) for i in range(256)])
    hub_hits = hnsw_device.search(idx, data[:6], 5)

    graph = idx._device
    import jax.numpy as jnp

    ids, raws, _d = hnsw_device._search_kernel(
        graph.x, graph.a0, graph.up_index, graph.up_adj, graph.lex_rank,
        graph.entry_slot, graph.entry_level, jnp.asarray(data[:6]),
        metric=graph.metric, lmax=graph.lmax, ef=32, limit=5,
        max_steps=hnsw_device.step_bound(32), xb=graph.xb,
        hub_slots=None, hub_x=None)
    for b in range(6):
        greedy = [graph.ids[s] for s in np.asarray(ids)[b] if s >= 0]
        hubbed = [id for id, _ in hub_hits[b]]
        assert greedy[0] == hubbed[0] == f"g-{b:03d}"
        assert len(set(greedy) & set(hubbed)) >= 4
