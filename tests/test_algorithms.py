"""Algorithm helper tests: batched top-k scans, MaxSim, MMR, MUVERA.

Mirrors the reference's per-NIF boundary suite
(vector_algorithms_hardening_test.exs), the in-module Rust suites for
search.rs / multi_vector.rs / muvera.rs, and the MMR doctests.
"""

import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu import errors
from vettore_tpu.metrics import METRICS, rank_value
from vettore_tpu.ops import maxsim, muvera
from vettore_tpu.ops.mmr import mmr_rerank


class TestVectorTopK:
    def test_prefix_similarity_and_ties(self):
        vectors = [("b", [1.0, 10.0]), ("a", [1.0, -10.0]), ("c", [-1.0, 0.0])]
        assert vt.vector_top_k(vectors, [1.0, 0.0], "l2", 1, 2) == [("a", 0.0), ("b", 0.0)]
        hits = vt.vector_top_k(vectors, [1.0, 1.0], "inner_product", 2, 1)
        assert hits[0][0] == "b"

    def test_rejects_bad_dimensions_and_values(self):
        with pytest.raises(errors.InvalidVector):
            vt.vector_top_k([], [1.0], "l2", 0, 1)
        with pytest.raises(errors.InvalidVector):
            vt.vector_top_k([], [1.0], "l2", 2, 1)
        with pytest.raises(errors.DimensionMismatch):
            vt.vector_top_k([("a", [1.0])], [1.0, 2.0], "l2", 2, 1)
        with pytest.raises(errors.InvalidVector):
            vt.vector_top_k([("a", [float("nan")])], [1.0], "l2", 1, 1)
        # only the requested prefix is read
        assert vt.vector_top_k([("a", [1.0, float("nan")])], [1.0, float("nan")], "l2", 1, 1) == [
            ("a", 0.0)
        ]

    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_full_sort_for_every_metric_and_limit(self, metric):
        vectors = []
        for i in range(37):
            vectors.append(
                (
                    f"id-{i:02d}",
                    [
                        (i - 18.0) / 7.0,
                        ((i * 11 % 17) - 8.0) / 5.0,
                        ((i * 7 % 13) - 6.0) / 3.0,
                        0.0 if i % 3 == 0 else 1.0,
                    ],
                )
            )
        query = [0.25, -0.75, 1.5, 0.0]
        from vettore_tpu.ops.scan_host import _cosine_or_raw

        for dims in [1, 3, 4]:
            q = np.asarray(query[:dims], dtype=np.float64)
            expected = []
            for id, v in vectors:
                raw = _cosine_or_raw(metric, q, np.asarray(v[:dims], dtype=np.float64))
                expected.append((rank_value(metric, raw), id, raw))
            expected.sort(key=lambda h: (h[0], h[1]))
            for limit in [0, 1, 5, 37, 100]:
                got = vt.vector_top_k(vectors, query, metric, dims, limit)
                assert got == [(id, raw) for _, id, raw in expected[:limit]]

    def test_stable_ties_independent_of_order(self):
        forward = [("c", [1.0]), ("a", [1.0]), ("b", [1.0])]
        expected = [("a", 0.0), ("b", 0.0)]
        assert vt.vector_top_k(forward, [1.0], "l2", 1, 2) == expected
        assert vt.vector_top_k(list(reversed(forward)), [1.0], "l2", 1, 2) == expected


class TestBinaryTopK:
    def test_masks_padding_and_orders_ids(self):
        q = vt.distance.compress_f32_vector([1.0, -1.0, 1.0])
        vectors = [
            ("b", vt.distance.compress_f32_vector([1.0, 1.0, 1.0])),
            ("a", vt.distance.compress_f32_vector([1.0, -1.0, 1.0])),
        ]
        assert vt.binary_top_k(vectors, q, 3, 2) == [("a", 0.0), ("b", 1.0)]

    def test_validates_empty_batches_and_boundaries(self):
        with pytest.raises(errors.InvalidVector):
            vt.binary_top_k([], [], 0, 1)
        with pytest.raises(errors.InvalidVector):
            vt.binary_top_k([], [], 1, 1)
        assert vt.binary_top_k([], [0], 1, 1) == []
        query = [2**64 - 1, 1]
        vectors = [("same", list(query)), ("far", [0, 0])]
        assert vt.binary_top_k(vectors, query, 65, 0) == []
        assert vt.binary_top_k(vectors, query, 65, 10) == [("same", 0.0), ("far", 65.0)]
        with pytest.raises(errors.InvalidVector):
            vt.binary_top_k([("bad", [0])], query, 65, 1)


class TestMaxSim:
    def test_scores_similarity_and_distance_metrics(self):
        query = [[1.0, 0.0], [0.0, 1.0]]
        document = [[1.0, 0.0], [0.0, 1.0]]
        assert maxsim.score(query, document, "inner_product") == 2.0
        assert maxsim.score(query, document, "negative_inner_product") == 2.0
        assert maxsim.score(query, document, "cosine") == 2.0
        assert maxsim.score(query, document, "l2") == 2.0
        assert maxsim.score([], document, "l2") == 0.0
        assert maxsim.score(query, [], "l2") == 0.0

    def test_top_k_stable_and_shape_validation(self):
        query = [[1.0, 0.0]]
        documents = [
            ("b", [[1.0, 0.0]]),
            ("a", [[1.0, 0.0]]),
            ("c", [[-1.0, 0.0]]),
        ]
        assert maxsim.top_k(documents, query, "inner_product", 2) == [("a", 1.0), ("b", 1.0)]
        with pytest.raises(errors.DimensionMismatch):
            maxsim.score(query, [[1.0]], "inner_product")
        with pytest.raises(errors.InvalidVector):
            maxsim.score([[float("nan"), 0.0]], query, "inner_product")

    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_independent_oracle(self, metric):
        from vettore_tpu.metrics import similarity_value
        from vettore_tpu.ops.scan_host import _cosine_or_raw

        query = [[1.0, -0.5, 0.0], [0.0, 1.0, 1.0]]
        document = [[1.0, 0.0, 0.0], [0.0, 1.0, -1.0], [-1.0, 0.5, 1.0]]
        expected = 0.0
        for qv in query:
            best = max(
                similarity_value(
                    metric,
                    _cosine_or_raw(metric, np.asarray(qv, np.float64), np.asarray(dv, np.float64)),
                )
                for dv in document
            )
            expected += best
        assert abs(maxsim.score(query, document, metric) - expected) <= 1e-6

    def test_validates_nonempty_side_even_when_other_empty(self):
        with pytest.raises(errors.InvalidVector):
            maxsim.score([], [[]], "l2")
        with pytest.raises(errors.InvalidVector):
            maxsim.score([], [[float("nan")]], "l2")
        with pytest.raises(errors.InvalidVector):
            maxsim.score([[]], [], "l2")
        with pytest.raises(errors.InvalidVector):
            maxsim.top_k([], [[]], "l2", 1)

    def test_score_overflow(self):
        query = [[1.0e19]] * 4
        document = [[1.0e19]]
        with pytest.raises(errors.ScoreOverflow):
            maxsim.score(query, document, "inner_product")

    def test_empty_queries_validate_documents_and_order_ties(self):
        documents = [("b", [[1.0]]), ("a", [[2.0]])]
        assert maxsim.top_k(documents, [], "l2", 10) == [("a", 0.0), ("b", 0.0)]

    def test_batched_matches_full_sort(self):
        query = [[1.0, 0.0], [0.0, 1.0]]
        documents = []
        for i in range(25):
            documents.append(
                (
                    f"doc-{i:02d}",
                    [
                        [(i - 12.0) / 5.0, 1.0],
                        [0.0, ((i * 7 % 11) - 5.0) / 3.0],
                    ],
                )
            )
        for metric in METRICS:
            expected = [(id, maxsim.score(query, vs, metric)) for id, vs in documents]
            expected.sort(key=lambda h: (-h[1], h[0]))
            for limit in [0, 1, 7, 25, 100]:
                assert maxsim.top_k(documents, query, metric, limit) == expected[:limit]

    def test_chamfer_alias(self):
        assert vt.multi_vector.colbert_score(
            [[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [1.0, 1.0]], "inner_product"
        ) == 2.0
        assert vt.multi_vector.chamfer(
            [[1.0, 0.0]], [[1.0, 0.0]], "inner_product"
        ) == 1.0


class TestMmr:
    def test_reference_example(self):
        initial = [("a", 0.9), ("b", 0.8), ("c", 0.1)]
        embeddings = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 1.0])]
        assert mmr_rerank(initial, embeddings, "cosine", 0.5, 2) == [("a", 0.9), ("c", 0.1)]
        with pytest.raises(errors.UnknownMetric):
            mmr_rerank(initial, embeddings, "unknown", 0.5, 2)

    def test_alpha_one_keeps_relevance_order(self):
        initial = [("a", 0.9), ("b", 0.8), ("c", 0.1)]
        embeddings = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 1.0])]
        assert mmr_rerank(initial, embeddings, "cosine", 1.0, 3) == initial

    def test_validation(self):
        embeddings = [("a", [1.0, 0.0])]
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("a", 0.9)], embeddings, "cosine", 1.5, 2)
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("a", 0.9)], embeddings, "cosine", 0.5, 0)
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("missing", 0.9)], embeddings, "cosine", 0.5, 1)
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("a", 0.9), ("a", 0.9)], embeddings, "cosine", 0.5, 1)
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("a", 0.9)], [("a", [1.0]), ("a", [1.0])], "cosine", 0.5, 1)
        with pytest.raises(errors.InvalidMmrArgs):
            mmr_rerank([("a", 0.9)], [("a", [1.0]), ("b", [1.0, 2.0])], "cosine", 0.5, 1)

    @pytest.mark.parametrize("metric", METRICS)
    def test_all_metrics_return_finite_prefix(self, metric):
        rng = np.random.default_rng(3)
        embeddings = [(f"e{i}", list(rng.normal(size=3))) for i in range(6)]
        initial = [(f"e{i}", float(1.0 - i * 0.1)) for i in range(6)]
        out = mmr_rerank(initial, embeddings, metric, 0.5, 4)
        assert len(out) == 4
        assert len({id for id, _ in out}) == 4


class TestMuvera:
    CFG = {
        "dimension": 2,
        "num_repetitions": 2,
        "num_simhash_projections": 1,
        "seed": 42,
        "projection_dimension": 2,
    }

    def test_deterministic_and_asymmetric(self):
        vectors = [[1.0, 0.0], [0.0, 1.0]]
        q1 = muvera.encode_query(vectors, self.CFG)
        q2 = muvera.encode_query(vectors, self.CFG)
        doc = muvera.encode_document(vectors, self.CFG)
        assert q1 == q2
        assert q1 != doc
        assert len(q1) == 8

    def test_projection_and_count_sketch(self):
        cfg = dict(self.CFG, projection_dimension=3, final_projection_dimension=5)
        assert len(muvera.encode_query([[1.0, 2.0]], cfg)) == 5

    def test_identity_projection_sum_and_average(self):
        cfg = {"num_repetitions": 1, "num_simhash_projections": 0, "seed": 0,
               "projection_dimension": 2}
        vectors = [[1.0, 2.0], [3.0, 4.0], [-2.0, 0.0]]
        assert muvera.encode_query(vectors, cfg) == [2.0, 6.0]
        doc = muvera.encode_document(vectors, cfg)
        assert abs(doc[0] - 2.0 / 3.0) < 1e-6
        assert abs(doc[1] - 2.0) < 1e-6

    def test_permutation_invariance_and_seed_sensitivity(self):
        vectors = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.5]]
        q = muvera.encode_query(vectors, self.CFG)
        assert q == muvera.encode_query(list(reversed(vectors)), self.CFG)
        doc = muvera.encode_document(vectors, self.CFG)
        rdoc = muvera.encode_document(list(reversed(vectors)), self.CFG)
        assert all(abs(a - b) <= 1e-6 for a, b in zip(doc, rdoc))
        other = dict(self.CFG, seed=43)
        assert q != muvera.encode_query(vectors, other)

    def test_rejects_invalid_configs(self):
        vectors = [[1.0, 0.0]]
        with pytest.raises(errors.InvalidMuveraConfig):
            muvera.encode_query([], self.CFG)
        with pytest.raises(errors.DimensionMismatch):
            muvera.encode_query([[1.0]], self.CFG)
        with pytest.raises(errors.InvalidVector):
            muvera.encode_query([[float("nan"), 0.0]], self.CFG)
        for bad in [
            dict(self.CFG, num_simhash_projections=31),
            dict(self.CFG, num_repetitions=0),
            dict(self.CFG, projection_dimension=0),
            dict(self.CFG, final_projection_dimension=0),
            dict(self.CFG, seed=-1),
            dict(self.CFG, bogus=1),
        ]:
            with pytest.raises((errors.InvalidMuveraConfig,)):
                muvera.encode_query(vectors, dict(bad, dimension=2))
        big = {"dimension": 2, "num_repetitions": muvera.MAX_OUTPUT_DIMENSIONS + 1,
               "num_simhash_projections": 0, "projection_dimension": 1}
        with pytest.raises(errors.InvalidMuveraConfig):
            muvera.encode_query(vectors, big)

    def test_overflow(self):
        F32_MAX = 3.4028234663852886e38
        cfg = {"dimension": 1, "projection_dimension": 1, "num_repetitions": 1,
               "num_simhash_projections": 0}
        with pytest.raises(errors.EncodingOverflow):
            muvera.encode_query([[F32_MAX], [F32_MAX]], cfg)
        # document averaging does not overflow
        assert muvera.encode_document([[F32_MAX], [F32_MAX]], cfg) == [F32_MAX]

    def test_partition_sizes(self):
        for projections in range(5):
            cfg = {"dimension": 2, "num_repetitions": 3,
                   "num_simhash_projections": projections, "projection_dimension": 5,
                   "seed": 42}
            out = muvera.encode_query([[1.0, -2.0]], cfg)
            assert len(out) == 3 * (1 << projections) * 5

    def test_weights_and_hash_ranges(self):
        from vettore_tpu.ops.muvera import _hash4, _random_signs, _random_weights

        for seed in [0, 1, 42, 2**64 - 1]:
            w = _random_weights(seed, 3, 7, 100)
            assert ((-1.0 <= w) & (w <= 1.0)).all()
            s = _random_signs(seed, 3, 7, 100)
            assert set(np.unique(s)) <= {-1.0, 1.0}
            assert int(_hash4(seed, 3, 7, 9)) == int(_hash4(seed, 3, 7, 9))

    def test_muvera_retrieval_recalls_exact_maxsim(self):
        """MUVERA FDE retrieval finds the same top document as exact MaxSim
        (mirrors vector_integration_test.exs:20-99)."""
        rng = np.random.default_rng(99)
        docs = {f"d{i}": [list(v) for v in rng.normal(size=(4, 16))] for i in range(20)}
        query = [list(v) for v in rng.normal(size=(3, 16))]
        # one document contains the query's own vectors — exact MaxSim and a
        # reasonable FDE approximation must both prefer it
        docs["d7"] = [list(v) for v in np.asarray(query) * 2.0] + docs["d7"][:1]
        cfg = {"dimension": 16, "num_repetitions": 4, "num_simhash_projections": 3,
               "seed": 7, "projection_dimension": 16}
        qfde = np.asarray(muvera.encode_query(query, cfg))
        scores = {}
        for id, vs in docs.items():
            dfde = np.asarray(muvera.encode_document(vs, cfg))
            scores[id] = float(qfde @ dfde)
        best_fde = max(scores, key=scores.get)
        exact = maxsim.top_k(list(docs.items()), query, "inner_product", 1)
        assert best_fde == exact[0][0]
