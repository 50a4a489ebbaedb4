"""Flat index tests: differential oracle vs full sort for all metrics/limits
(flat.rs:209-249), tie stability independent of candidate order
(search.rs:263-281), batch atomicity (flat.rs:183-196), and lifecycle."""

import numpy as np
import pytest

from vettore_tpu import errors
from vettore_tpu.index.flat import FlatIndex
from vettore_tpu.metrics import METRICS, rank_value
from vettore_tpu.ops import distance as d

F32_MAX = 3.4028234663852886e38


def oracle(pairs, query, metric, limit):
    hits = []
    for id, vec in pairs:
        raw = d.compute(metric, query, vec)
        hits.append((rank_value(metric, raw), id, raw))
    hits.sort(key=lambda h: (h[0], h[1]))
    return [(id, raw) for _, id, raw in hits[:limit]]


def vt_collection_compressed():
    import vettore_tpu as vt

    col = vt.Collection(dimensions=2, metric="cosine", compressed=True)
    col.put({"id": "a", "vector": [1.0, 0.0]})
    return col


def make_pairs(n=37, dims=4):
    pairs = []
    for i in range(n):
        vec = [
            (i - 18.0) / 7.0,
            ((i * 11 % 17) - 8.0) / 5.0,
            ((i * 7 % 13) - 6.0) / 3.0,
            0.0 if i % 3 == 0 else 1.0,
        ][:dims]
        pairs.append((f"id-{i:02d}", vec))
    return pairs


class TestSearchOracle:
    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_full_sort(self, metric):
        pairs = make_pairs()
        query = [0.25, -0.75, 1.5, 0.0]
        index = FlatIndex(metric)
        index.put_many(pairs)
        for limit in [1, 5, 37, 100]:
            got = index.search(query, limit)
            expected = oracle(pairs, query, metric, limit)
            assert [g[0] for g in got] == [e[0] for e in expected], (metric, limit)
            for (_, gr), (_, er) in zip(got, expected):
                assert abs(gr - er) <= 4e-6 * max(1.0, abs(er)), (metric, limit)

    def test_limit_zero(self):
        index = FlatIndex("l2")
        index.put("a", [1.0])
        assert index.search([1.0], 0) == []

    def test_stable_ties_independent_of_order(self):
        forward = [("c", [1.0]), ("a", [1.0]), ("b", [1.0])]
        expected = [("a", 0.0), ("b", 0.0)]
        for order in (forward, list(reversed(forward))):
            index = FlatIndex("l2")
            index.put_many(order)
            assert index.search([1.0], 2) == expected


class TestLifecycle:
    def test_insert_replace_delete_dimension_reset(self):
        index = FlatIndex("inner_product")
        index.put("a", [1.0, 0.0])
        index.put("a", [0.0, 1.0])  # replace
        assert len(index) == 1
        assert index.search([0.0, 1.0], 1)[0] == ("a", 1.0)
        index.delete("a")
        assert index.dimension is None
        assert index.search([0.0, 1.0], 1) == []
        index.put("b", [1.0, 2.0, 3.0])  # new dimension accepted after reset
        assert index.dimension == 3

    def test_batch_validation_is_atomic(self):
        index = FlatIndex("l2")
        index.put("a", [1.0, 0.0])
        with pytest.raises(errors.DimensionMismatch):
            index.put_many([("b", [0.0, 1.0]), ("bad", [1.0])])
        assert len(index) == 1

    def test_rejects_bad_vectors(self):
        index = FlatIndex("cosine")
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

    def test_invalid_options_and_metric(self):
        with pytest.raises(errors.InvalidFlatOptions):
            FlatIndex("l2", {"x": 1})
        with pytest.raises(errors.UnsupportedFlatMetric):
            FlatIndex("bogus")
        assert FlatIndex("euclidean").metric == "l2"

    def test_growth_beyond_initial_capacity(self):
        index = FlatIndex("l2")
        pairs = [(f"{i:04d}", [float(i)]) for i in range(100)]
        index.put_many(pairs[:5])
        index.put_many(pairs[5:])
        hits = index.search([99.0], 3)
        assert hits[0][0] == "0099"
        assert len(index) == 100


class TestSearchBatch:
    @pytest.mark.parametrize("metric", ["cosine", "l2", "inner_product", "hamming"])
    def test_matches_single_query_path(self, metric):
        pairs = make_pairs()
        index = FlatIndex(metric)
        index.put_many(pairs)
        queries = np.array([[0.25, -0.75, 1.5, 0.0], [1.0, 1.0, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
        batched = index.search_batch(queries, 5)
        for q, hits in zip(queries, batched):
            single = index.search(list(q), 5)
            assert [h[0] for h in hits] == [s[0] for s in single]
            for (_, hr), (_, sr) in zip(hits, single):
                assert abs(hr - sr) <= 1e-5 * max(1.0, abs(sr))

    def test_empty_and_limit_zero(self):
        index = FlatIndex("l2")
        assert index.search_batch(np.zeros((2, 3)), 4) == [[], []]
        index.put("a", [1.0])
        assert index.search_batch(np.zeros((2, 1)), 0) == [[], []]

    def test_batch_overflow_rows_recover(self):
        F32_MAX = 3.4028234663852886e38
        index = FlatIndex("inner_product")
        index.put_many([("big", [F32_MAX, F32_MAX]), ("small", [1.0, 1.0])])
        res = index.search_batch(np.array([[2.0, -2.0], [1.0, 0.0]]), 2)
        assert dict(res[0])["big"] == 0.0
        assert dict(res[1])["small"] == 1.0


class TestFusedGroupScan:
    """The fused group-min scan must match the XLA path exactly (ids and
    tie-break) once the index is large enough to trigger it."""

    @pytest.mark.parametrize("metric", ["cosine", "l2", "inner_product",
                                        "negative_inner_product", "l2_squared"])
    def test_matches_xla_path(self, metric):
        rng = np.random.default_rng(17)
        n, d = 1500, 16  # cap rounds to 2048 >= ROW_TILE -> fused eligible
        data = rng.normal(size=(n, d)).astype(np.float32)
        data[5] = data[6]  # exercise ties
        index = FlatIndex(metric)
        index.put_many((f"doc-{i:05d}", data[i]) for i in range(n))
        assert index._fused_eligible(8)
        queries = data[[3, 100, 700]]
        fused = index.search_batch(queries, 8)
        # force the XLA path for comparison
        from vettore_tpu.index.flat import _search_kernel_batch
        import jax
        import jax.numpy as jnp
        x, valid, lex_order = index._device
        out = _search_kernel_batch(x, valid, lex_order, jnp.asarray(queries),
                                   metric=metric, limit=8)
        slots, raws, _r, _f = jax.device_get(out)
        for b in range(3):
            xla_hits = [(index._ids[int(s)], float(r)) for s, r in zip(slots[b], raws[b])]
            assert [h[0] for h in fused[b]] == [h[0] for h in xla_hits]
            for (_, fr), (_, xr) in zip(fused[b], xla_hits):
                assert abs(fr - xr) <= 1e-5 * max(1.0, abs(xr))

    def test_bf16_storage_mode(self):
        rng = np.random.default_rng(23)
        n, d = 1200, 32
        data = rng.normal(size=(n, d)).astype(np.float32)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        exact = FlatIndex("cosine")
        exact.put_many((f"doc-{i:05d}", data[i]) for i in range(n))
        fast = FlatIndex("cosine", storage="bf16")
        fast.put_many((f"doc-{i:05d}", data[i]) for i in range(n))
        queries = data[[7, 300, 900]]
        got = fast.search_batch(queries, 10)
        truth = exact.search_batch(queries, 10)
        for g, t in zip(got, truth):
            # approximate mode: top hit identical, high overlap, raws ~1e-2
            assert g[0][0] == t[0][0]
            assert len({x[0] for x in g} & {x[0] for x in t}) >= 8
            assert abs(g[0][1] - t[0][1]) < 2e-2
        with pytest.raises(errors.InvalidFlatOptions):
            FlatIndex("cosine", storage="fp4")

    def test_compressed_collection_uses_bf16(self):
        col = vt_collection_compressed()
        assert col.index.storage == "bf16"
        res = col.search([1.0, 0.0], limit=1)
        assert res[0].id == "a"

    def test_fused_overflow_falls_back(self):
        F32_MAX = 3.4028234663852886e38
        index = FlatIndex("inner_product")
        pairs = [(f"p{i:04d}", [1.0, 1.0]) for i in range(1100)]
        pairs.append(("big", [F32_MAX, F32_MAX]))
        index.put_many(pairs)
        assert index._fused_eligible(4)
        res = index.search_batch(np.array([[2.0, -2.0]]), 4)
        assert dict(res[0]).get("big") == 0.0

    def test_deleted_overflow_row_stays_on_device(self, monkeypatch):
        # the fused scan encodes overflow as -inf group minima; a deleted
        # row's stale data must not alias it — delete zeroes the slot, so
        # the search stays on device (no host-oracle stampede)
        F32_MAX = 3.4028234663852886e38
        rng = np.random.default_rng(5)
        index = FlatIndex("inner_product")
        index.put_many((f"p{i:04d}", row)
                       for i, row in enumerate(rng.normal(size=(1100, 4)).astype(np.float32)))
        index.put("big", [F32_MAX, F32_MAX, F32_MAX, F32_MAX])
        index.delete("big")
        assert not index._host_x[index._valid == False].any()  # noqa: E712
        monkeypatch.setattr(index, "_host_search",
                            lambda *a, **k: pytest.fail("fell back to host"))
        res = index.search_batch(rng.normal(size=(3, 4)), 5)
        assert all(len(r) == 5 for r in res) and "big" not in dict(res[0])


class TestOverflowRecovery:
    def test_recoverable(self):
        index = FlatIndex("inner_product")
        index.put_many([("big", [F32_MAX, F32_MAX]), ("small", [1.0, 1.0])])
        hits = index.search([2.0, -2.0], 2)
        assert dict(hits)["big"] == 0.0

    def test_genuine_overflow_errors(self):
        index = FlatIndex("l2_squared")
        index.put("big", [1.0e20])
        with pytest.raises(errors.MetricOverflow):
            index.search([0.0], 1)


class TestGroupScanTieSpill:
    def test_mass_tie_falls_back_to_exact_host(self):
        # every row identical: all ranks tie across >slack groups, which must
        # raise the fallback flag and still return the lex-smallest ids
        n, d = 2048, 8
        index = FlatIndex("cosine")
        index.put_many((f"doc-{i:05d}", [1.0] + [0.0] * (d - 1)) for i in range(n))
        assert index._fused_eligible(8)
        hits = index.search([1.0] + [0.0] * (d - 1), 8)
        assert [h[0] for h in hits] == [f"doc-{i:05d}" for i in range(8)]

    def test_partial_tie_within_slack_stays_on_device(self):
        rng = np.random.default_rng(99)
        n, d = 2048, 8
        data = rng.normal(size=(n, d)).astype(np.float32)
        data[100] = data[500] = data[900]  # 3-way tie, within slack
        index = FlatIndex("l2")
        index.put_many((f"doc-{i:05d}", data[i]) for i in range(n))
        hits = index.search(data[900], 5)
        assert [h[0] for h in hits[:3]] == ["doc-00100", "doc-00500", "doc-00900"]
