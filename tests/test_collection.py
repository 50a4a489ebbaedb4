"""Collection-level integration tests: every public search mode, option
validation, insert pipeline semantics, snapshot round-trips.

Mirrors /root/reference/test/vector_db_test.exs and the adaptive-equals-exact
invariant from vector_adversarial_test.exs:376-421.
"""

import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu import errors


def normalized(v):
    a = np.asarray(v, dtype=np.float64)
    n = np.linalg.norm(a)
    return a / n if n else a


@pytest.fixture
def corpus():
    rng = np.random.default_rng(20260721)
    vectors = rng.normal(size=(40, 8))
    return [(f"doc-{i:02d}", list(vectors[i])) for i in range(40)]


def make_collection(corpus, **opts):
    options = dict(name="t", dimensions=8, metric="cosine", index="flat")
    options.update(opts)
    col = vt.Collection(**options)
    col.put_many([{"id": id, "vector": v, "metadata": {"i": i}}
                  for i, (id, v) in enumerate(corpus)])
    return col


class TestLifecycle:
    def test_put_get_delete_all(self, corpus):
        col = make_collection(corpus)
        assert col.count() == 40
        emb = col.get("doc-03")
        assert emb.value == "doc-03"
        assert emb.metadata == {"i": 3}
        # vectors are l2-normalized at insert (metric cosine defaults to l2)
        np.testing.assert_allclose(
            np.asarray(emb.vector), normalized(corpus[3][1]).astype(np.float32), rtol=1e-6
        )
        assert emb.binary_vector is not None
        col.delete("doc-03")
        with pytest.raises(errors.NotFound):
            col.get("doc-03")
        assert col.count() == 39
        col.delete("missing")  # no-op like the reference index delete

    def test_duplicate_ids_rejected(self, corpus):
        col = make_collection(corpus)
        with pytest.raises(errors.DuplicateId):
            col.put({"id": "doc-00", "vector": corpus[0][1]})

    def test_value_used_as_id(self):
        col = vt.Collection(dimensions=2)
        col.put({"value": "legacy", "vector": [1.0, 0.0]})
        assert col.get("legacy").value == "legacy"
        with pytest.raises(errors.MissingId):
            col.put({"value": "", "vector": [1.0, 0.0]})

    def test_multi_vector_mean_primary(self):
        col = vt.Collection(dimensions=2, metric="inner_product", normalize="none")
        col.put({"id": "mv", "vectors": [[1.0, 0.0], [0.0, 1.0]]})
        emb = col.get("mv")
        np.testing.assert_allclose(np.asarray(emb.vector), [0.5, 0.5])
        assert len(emb.vectors) == 2

    def test_closed(self, corpus):
        col = make_collection(corpus)
        col.close()
        with pytest.raises(errors.Closed):
            col.search([1.0] * 8, limit=2)
        with pytest.raises(errors.Closed):
            col.put({"id": "x", "vector": [1.0] * 8})

    def test_option_validation(self):
        with pytest.raises(errors.InvalidDimensions):
            vt.Collection(dimensions=0)
        with pytest.raises(errors.InvalidMetric):
            vt.Collection(dimensions=2, metric="bogus")
        with pytest.raises(errors.InvalidNormalization):
            vt.Collection(dimensions=2, normalize="bogus")
        with pytest.raises(errors.InvalidScoreMode):
            vt.Collection(dimensions=2, score="bogus")
        with pytest.raises(errors.UnsupportedOption):
            vt.Collection(dimensions=2, nonsense=True)
        with pytest.raises(errors.InvalidFlatOptions):
            vt.Collection(dimensions=2, index="flat", index_options={"m": 4})
        assert vt.Collection(dimensions=2, metric="euclidean").metric == "l2"
        assert vt.Collection(dimensions=2, metric="dot").normalize == "none"
        assert vt.Collection(dimensions=2, metric="cosine").normalize == "l2"


class TestSearch:
    def test_exact_search_results(self, corpus):
        col = make_collection(corpus)
        q = corpus[7][1]
        results = col.search(q, limit=3)
        assert results[0].id == "doc-07"
        assert results[0].metric == "cosine"
        assert abs(results[0].score - 1.0) < 1e-5
        assert abs(results[0].distance - 0.0) < 1e-5
        assert results[0].metadata == {"i": 7}
        assert len(results) == 3

    def test_search_option_validation(self, corpus):
        col = make_collection(corpus)
        with pytest.raises(errors.InvalidLimit):
            col.search(corpus[0][1], limit=0)
        with pytest.raises(errors.UnsupportedOption):
            col.search(corpus[0][1], limit=2, bogus=1)
        with pytest.raises(errors.DimensionMismatch):
            col.search([1.0, 2.0], limit=2)

    def test_similarity_score_mode(self, corpus):
        col = make_collection(corpus, score="similarity")
        results = col.search(corpus[7][1], limit=1)
        # cosine similarity mode: score = (raw + 1) / 2
        assert abs(results[0].score - 1.0) < 1e-5
        assert abs(results[0].distance - 0.0) < 1e-5

    def test_search_batch_matches_single(self, corpus):
        col = make_collection(corpus)
        queries = [corpus[3][1], corpus[11][1]]
        batched = col.search_batch(queries, limit=4)
        for q, hits in zip(queries, batched):
            single = col.search(q, limit=4)
            assert [h.id for h in hits] == [s.id for s in single]


class TestAdaptiveModes:
    """With candidates >= collection size, every adaptive mode must return
    exactly the flat exact results (vector_adversarial_test.exs:376-421)."""

    def test_funnel_full_candidates_equals_exact(self, corpus):
        col = make_collection(corpus)
        q = list(np.asarray(corpus[5][1]) * 0.7 + 0.1)
        exact = col.search(q, limit=10)
        funnel = col.funnel_search(q, stages=[4, 8], candidates=40, limit=10)
        assert [r.id for r in funnel] == [r.id for r in exact]

    def test_quantized_full_candidates_equals_exact(self, corpus):
        col = make_collection(corpus)
        q = list(np.asarray(corpus[5][1]) * 0.7 + 0.1)
        exact = col.search(q, limit=10)
        quantized = col.quantized_search(q, candidates=40, limit=10)
        assert [r.id for r in quantized] == [r.id for r in exact]

    def test_batched_modes_match_single(self, corpus):
        col = make_collection(corpus)
        queries = [
            list(np.asarray(corpus[5][1]) * 0.7 + 0.1),
            list(np.asarray(corpus[2][1]) * 0.4 - 0.2),
            corpus[9][1],
        ]
        fb = col.funnel_search_batch(queries, stages=[4, 8], candidates=12, limit=5)
        qb = col.quantized_search_batch(queries, candidates=12, limit=5)
        for i, q in enumerate(queries):
            fs = col.funnel_search(q, stages=[4, 8], candidates=12, limit=5)
            qs = col.quantized_search(q, candidates=12, limit=5)
            assert [r.id for r in fb[i]] == [r.id for r in fs]
            assert [r.id for r in qb[i]] == [r.id for r in qs]
            # vmapped matmuls may reduce in a different order: scores agree
            # to f32 precision, not bit-for-bit
            for br, sr in zip(qb[i], qs):
                assert br.score == pytest.approx(sr.score, abs=1e-5)

    def test_multi_vector_bulk_prepare_matches_per_record(self):
        """The vectorized multi-vector ingest path (>=256 homogeneous
        records) must produce byte-identical embeddings to the per-record
        pipeline."""
        rng = np.random.default_rng(3)
        # t/d large enough that an f32 (vs f64) mean would diverge
        d, t = 64, 33
        records = [
            {"id": f"m-{i:04d}", "vectors": rng.normal(size=(t, d)).tolist()}
            for i in range(300)
        ]
        big = vt.Collection(name="bulk", dimensions=d, metric="cosine")
        big.put_many(records)
        small = vt.Collection(name="one", dimensions=d, metric="cosine")
        for r in records[:10]:
            small.put(r)
        for r in records[:10]:
            a, b = big.get(r["id"]), small.get(r["id"])
            assert np.allclose(a.vector, b.vector, atol=0)
            assert a.binary_vector == b.binary_vector
            assert all(np.allclose(x, y, atol=0) for x, y in zip(a.vectors, b.vectors))

    def test_batched_modes_validation(self, corpus):
        col = make_collection(corpus)
        with pytest.raises(errors.InvalidCandidates):
            col.funnel_search_batch([corpus[0][1]], candidates=2, limit=5)
        with pytest.raises(errors.DimensionMismatch):
            col.quantized_search_batch([[1.0]], limit=5)
        assert col.quantized_search_batch([], limit=5) == []

    def test_hybrid_full_candidates_equals_exact(self, corpus):
        col = make_collection(corpus)
        q = list(np.asarray(corpus[5][1]) * 0.7 + 0.1)
        exact = col.search(q, limit=10)
        hybrid = col.hybrid_search(
            q,
            generators=[("funnel", {"candidates": 40, "stages": [4, 8]}),
                        ("quantized", {"candidates": 40})],
            rerank="exact",
            limit=10,
        )
        assert [r.id for r in hybrid] == [r.id for r in exact]

    def test_funnel_option_validation(self, corpus):
        col = make_collection(corpus)
        q = corpus[0][1]
        with pytest.raises(errors.InvalidStages):
            col.funnel_search(q, stages=[])
        with pytest.raises(errors.InvalidStages):
            col.funnel_search(q, stages=[16])  # > dimensions
        with pytest.raises(errors.InvalidCandidates):
            col.funnel_search(q, limit=10, candidates=5)
        with pytest.raises(errors.UnsupportedOption):
            col.funnel_search(q, bogus=1)

    def test_funnel_default_stage(self, corpus):
        col = make_collection(corpus)
        # default stage = [min(dims, 128)] = [8] = full dims -> equals exact
        exact = col.search(corpus[2][1], limit=5)
        funnel = col.funnel_search(corpus[2][1], candidates=40, limit=5)
        assert [r.id for r in funnel] == [r.id for r in exact]

    def test_funnel_stage_narrowing(self, corpus):
        col = make_collection(corpus)
        results = col.funnel_search(corpus[2][1], stages=[2, 4], candidates=12, limit=5)
        assert len(results) == 5
        assert len({r.id for r in results}) == 5

    def test_negative_ndarray_binary_vector_rejected(self, corpus):
        """Signed numpy arrays must not silently WRAP under the uint64 cast
        (only Python ints raise OverflowError on negatives)."""
        col = make_collection(corpus)
        rec = col.all()[0]
        rec.binary_vector = np.array([-1], dtype=np.int64)
        col.refresh()
        with pytest.raises(errors.InvalidBinaryVector):
            col.quantized_search(corpus[0][1], candidates=12, limit=5)

    def test_quantized_small_candidates(self, corpus):
        col = make_collection(corpus)
        results = col.quantized_search(corpus[9][1], candidates=15, limit=5)
        assert len(results) == 5
        # quantized self-query should still surface the record itself
        assert "doc-09" in {r.id for r in results}

    def test_empty_collection(self):
        col = vt.Collection(dimensions=4)
        assert col.search([1.0] * 4, limit=3) == []
        assert col.funnel_search([1.0] * 4, limit=3) == []
        assert col.quantized_search([1.0] * 4, limit=3) == []
        assert col.multi_vector_search([[1.0] * 4], limit=3) == []
        assert col.hybrid_search([1.0] * 4, limit=3) == []


class TestMultiVector:
    def test_colbert_search(self):
        col = vt.Collection(dimensions=2, metric="inner_product", normalize="none")
        col.put_many([
            {"id": "page-1", "vectors": [[1.0, 0.0], [0.0, 1.0]]},
            {"id": "page-2", "vectors": [[-1.0, 0.0], [0.0, -1.0]]},
            {"id": "solo", "vector": [0.5, 0.5]},
        ])
        results = col.multi_vector_search([[1.0, 0.0], [0.0, 1.0]], limit=3)
        assert results[0].id == "page-1"
        assert abs(results[0].score - 2.0) < 1e-5
        assert results[0].distance is None
        # "solo" scores via its primary vector
        solo = [r for r in results if r.id == "solo"][0]
        assert abs(solo.score - 1.0) < 1e-5

    def test_metric_override(self):
        col = vt.Collection(dimensions=2, metric="l2", normalize="none")
        col.put({"id": "a", "vectors": [[1.0, 0.0]]})
        results = col.multi_vector_search([[1.0, 0.0]], metric="inner_product", limit=1)
        assert results[0].metric == "inner_product"
        assert abs(results[0].score - 1.0) < 1e-6

    def test_matches_host_oracle(self, corpus):
        rng = np.random.default_rng(5)
        col = vt.Collection(dimensions=4, metric="cosine")
        docs = []
        for i in range(12):
            t = int(rng.integers(1, 5))
            vecs = [list(rng.normal(size=4)) for _ in range(t)]
            docs.append({"id": f"d{i:02d}", "vectors": vecs})
        col.put_many(docs)
        queries = [list(rng.normal(size=4)) for _ in range(3)]
        got = col.multi_vector_search(queries, limit=12)
        # oracle over the normalized stored vectors
        from vettore_tpu.ops import maxsim
        stored = [(r.id, [list(np.asarray(v, np.float64)) for v in r.vectors])
                  for r in sorted(col.all(), key=lambda r: r.id)]
        nq = [list(np.asarray(vt.distance.normalize(q, "l2"))) for q in queries]
        expected = maxsim.top_k(stored, nq, "cosine", 12)
        assert [r.id for r in got] == [e[0] for e in expected]
        for r, (_, s) in zip(got, expected):
            assert abs(r.score - s) < 1e-4


class TestHybrid:
    def test_default_generators(self, corpus):
        col = make_collection(corpus)
        results = col.hybrid_search(corpus[4][1], limit=5)
        assert results[0].id == "doc-04"
        assert len(results) == 5

    def test_multi_vector_rerank(self):
        col = vt.Collection(dimensions=2, metric="inner_product", normalize="none")
        col.put_many([
            {"id": "a", "vector": [1.0, 0.0], "vectors": [[1.0, 0.0], [0.0, 1.0]]},
            {"id": "b", "vector": [0.9, 0.1]},
        ])
        results = col.hybrid_search(
            [1.0, 0.0],
            generators=[("quantized", {"candidates": 2})],
            rerank=("multi_vector", [[1.0, 0.0], [0.0, 1.0]]),
            limit=2,
        )
        assert results[0].id == "a"
        assert abs(results[0].score - 2.0) < 1e-5

    def test_generator_validation(self, corpus):
        col = make_collection(corpus)
        q = corpus[0][1]
        with pytest.raises(errors.UnknownGenerator):
            col.hybrid_search(q, generators=["bogus"])
        with pytest.raises(errors.UnsupportedOption):
            col.hybrid_search(q, generators=[("quantized", {"stages": [2]})])
        with pytest.raises(errors.HnswIndexRequired):
            col.hybrid_search(q, generators=["hnsw"])
        with pytest.raises(errors.InvalidRerank):
            col.hybrid_search(q, rerank="bogus")
        with pytest.raises(errors.InvalidGenerator):
            col.hybrid_search(q, generators=[])

    def test_search_generator(self, corpus):
        col = make_collection(corpus)
        results = col.hybrid_search(
            corpus[6][1], generators=[("search", {"candidates": 20})], limit=5
        )
        assert results[0].id == "doc-06"


class TestSnapshot:
    def test_round_trip(self, corpus, tmp_path):
        path = str(tmp_path / "col.snap")
        col = make_collection(corpus, name="orig", score="similarity")
        exact = col.search(corpus[3][1], limit=5)
        col.snapshot(path)

        loaded = vt.load_snapshot(path)
        assert loaded.name == "orig"
        assert loaded.metric == "cosine"
        assert loaded.score == "similarity"
        again = loaded.search(corpus[3][1], limit=5)
        assert [r.id for r in again] == [r.id for r in exact]
        for a, b in zip(again, exact):
            assert abs(a.score - b.score) < 1e-6
        emb = loaded.get("doc-00")
        assert emb.metadata == {"i": 0}

    def test_overrides_persist(self, corpus, tmp_path):
        path = str(tmp_path / "col.snap")
        col = make_collection(corpus)
        col.snapshot(path)
        loaded = vt.load_snapshot(path, name="renamed", score="similarity")
        assert loaded.name == "renamed"
        assert loaded.score == "similarity"
        path2 = str(tmp_path / "col2.snap")
        loaded.snapshot(path2)
        again = vt.load_snapshot(path2)
        assert again.name == "renamed"
        assert again.score == "similarity"

    def test_unsupported_override(self, corpus, tmp_path):
        path = str(tmp_path / "col.snap")
        make_collection(corpus).snapshot(path)
        with pytest.raises(errors.UnsupportedSnapshotOverride):
            vt.load_snapshot(path, metric="l2")

    def test_corrupt_snapshot(self, tmp_path):
        path = str(tmp_path / "bad.snap")
        open(path, "wb").write(b"garbage")
        with pytest.raises(errors.InvalidSnapshot):
            vt.load_snapshot(path)


class TestBlockSharingAndAttach:
    def test_scan_cache_shares_flat_block_when_lex_ingested(self):
        import numpy as np
        from vettore_tpu.collection import Collection

        rng = np.random.default_rng(3)
        data = rng.normal(size=(1200, 16)).astype(np.float64)
        ids = [f"d{i:05d}" for i in range(1200)]  # lex order == insert order
        col = Collection(name="s", dimensions=16, metric="cosine")
        col.put_matrix(ids, data)
        cache = col._scan_cache()
        x, _valid = cache.vectors()
        col.index._sync_device()
        assert x is col.index._device[0]
        # funnel through the shared block still matches the exact scan
        q = list(data[7] / np.linalg.norm(data[7]))
        exact = [r.id for r in col.search(q, limit=5)]
        fun = [r.id for r in col.funnel_search(q, limit=5, candidates=1200,
                                               stages=[16])]
        assert exact == fun

    def test_scan_cache_no_share_after_unordered_insert(self):
        import numpy as np
        from vettore_tpu.collection import Collection

        col = Collection(name="u", dimensions=4, metric="cosine")
        col.put_many([{"id": "zz", "vector": [1.0, 0, 0, 0]},
                      {"id": "aa", "vector": [0, 1.0, 0, 0]}])
        cache = col._scan_cache()
        x, _ = cache.vectors()  # must not crash; slot order != lex order
        got = [r.id for r in col.funnel_search([1.0, 0, 0, 0], limit=2,
                                               candidates=2, stages=[4])]
        assert got == ["zz", "aa"]

    def test_attach_index_warm_start(self, tmp_path):
        import numpy as np
        from vettore_tpu.collection import Collection
        from vettore_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(5)
        data = rng.normal(size=(64, 8)).astype(np.float64)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        ids = [f"d{i:04d}" for i in range(64)]
        col = Collection(name="w", dimensions=8, metric="cosine", index="hnsw",
                         index_options={"m": 4, "m0": 8})
        col.put_matrix(ids, data)
        col.index.BULK_THRESHOLD = 10**9  # host-built graph is fine here
        path = str(tmp_path / "g.npz")
        fresh = HnswIndex("cosine", {"m": 4, "m0": 8})
        fresh.BULK_THRESHOLD = 2
        fresh.put_many(zip(ids, np.asarray([col.get(i).vector for i in ids])))
        fresh.save_graph(path)
        loaded = HnswIndex.load_graph("cosine", {"m": 4, "m0": 8}, path)
        col.attach_index(loaded)
        hits = col.search(list(data[3]), limit=3)
        assert hits[0].id == ids[3]

    def test_attach_index_count_mismatch_rejected(self):
        import pytest as _pytest
        from vettore_tpu import errors as E
        from vettore_tpu.collection import Collection
        from vettore_tpu.index.flat import FlatIndex

        col = Collection(name="m", dimensions=2, metric="l2")
        col.put_many([{"id": "a", "vector": [0.0, 1.0]}])
        other = FlatIndex("l2")
        with _pytest.raises(E.InvalidIndex):
            col.attach_index(other)
