"""Parity tests for the batched serving paths.

Every batched mode must return, per query, exactly what its single-query
counterpart returns (the single paths are themselves oracle-checked against
the reference semantics elsewhere): ``multi_vector_search_batch`` vs
``multi_vector_search`` (multi_vector.rs:90-132), ``hybrid_search_batch`` vs
``hybrid_search`` (collection.ex:337-348), and the device MMR vs the host
greedy loop (vettore_distance.ex:416-436). Also covers the chunked-scan
kernel (doc streaming past any single intermediate) and bf16-resident token
blocks (lossless for bf16-exact corpora).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu.ops import maxsim as maxsim_ops
from vettore_tpu.ops.mmr import mmr_rerank, mmr_rerank_batch
from vettore_tpu.ops.transport import round_to_bf16

DIMS = 48
N_DOCS = 90


def _corpus(rng, multi=True, bf16_exact=False):
    docs = []
    for i in range(N_DOCS):
        vec = rng.normal(size=DIMS)
        vec /= np.linalg.norm(vec)
        if bf16_exact:
            vec = round_to_bf16(vec.astype(np.float32)).astype(np.float64)
        doc = {"id": f"doc-{i:03d}", "vector": [float(x) for x in vec]}
        if multi:
            t = 2 + (i % 3)
            toks = rng.normal(size=(t, DIMS))
            if bf16_exact:
                toks = round_to_bf16(toks.astype(np.float32)).astype(np.float64)
            doc["vectors"] = [list(map(float, row)) for row in toks]
            del doc["vector"]
        docs.append(doc)
    return docs


def _query_sets(rng, count):
    sets = []
    for i in range(count):
        q = rng.normal(size=(1 + (i % 4), DIMS))
        sets.append([list(map(float, row)) for row in q])
    return sets


def _res_tuples(results):
    return [(r.id, pytest.approx(r.score, rel=1e-5, abs=1e-6)) for r in results]


@pytest.fixture(scope="module")
def mv_col():
    rng = np.random.default_rng(7)
    col = vt.Collection(name="bm-mv", dimensions=DIMS, metric="cosine", index="flat")
    col.put_many(_corpus(rng))
    return col


class TestMultiVectorBatch:
    @pytest.mark.parametrize("metric", ["cosine", "l2", "inner_product", "manhattan"])
    def test_matches_single(self, mv_col, metric):
        rng = np.random.default_rng(11)
        sets = _query_sets(rng, 6)
        batch = mv_col.multi_vector_search_batch(sets, limit=7, metric=metric)
        assert len(batch) == len(sets)
        for qs, got in zip(sets, batch):
            want = mv_col.multi_vector_search(qs, limit=7, metric=metric)
            assert [r.id for r in got] == [r.id for r in want]
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w.score, rel=1e-4, abs=1e-5)

    def test_empty_batch_and_limit_validation(self, mv_col):
        assert mv_col.multi_vector_search_batch([]) == []
        with pytest.raises(vt.errors.InvalidLimit):
            mv_col.multi_vector_search_batch([[[0.0] * DIMS]], limit=0)
        with pytest.raises(vt.errors.InvalidMetric):
            mv_col.multi_vector_search_batch([[[0.0] * DIMS]], metric="nope")
        with pytest.raises(vt.errors.InvalidMultiVector):
            mv_col.multi_vector_search_batch([[]])

    def test_empty_collection(self):
        col = vt.Collection(name="bm-empty", dimensions=DIMS, metric="cosine")
        out = col.multi_vector_search_batch([[[0.0] * DIMS]], limit=3)
        assert out == [[]]

    def test_single_vector_corpus(self):
        rng = np.random.default_rng(23)
        col = vt.Collection(name="bm-sv", dimensions=DIMS, metric="cosine")
        col.put_many(_corpus(rng, multi=False))
        sets = _query_sets(rng, 3)
        batch = col.multi_vector_search_batch(sets, limit=5)
        for qs, got in zip(sets, batch):
            want = col.multi_vector_search(qs, limit=5)
            assert [r.id for r in got] == [r.id for r in want]


class TestChunkedScanKernel:
    def test_chunked_equals_single_chunk(self):
        rng = np.random.default_rng(31)
        n, t, d, b, qt = 200, 3, 16, 5, 4
        tokens = jnp.asarray(rng.normal(size=(n, t, d)).astype(np.float32))
        counts = jnp.asarray(rng.integers(1, t + 1, size=n).astype(np.int32))
        valid = jnp.asarray(np.arange(n) < n - 8)
        qtok = jnp.asarray(rng.normal(size=(b, qt, d)).astype(np.float32))
        qmask = jnp.asarray(np.arange(qt)[None, :] < np.array([1, 2, 3, 4, 4])[:, None])
        whole = maxsim_ops.maxsim_full_topk_batch(
            tokens, counts, valid, qtok, qmask, metric="cosine", limit=10, chunk=n)
        for chunk in (64, 128, 200):
            part = maxsim_ops.maxsim_full_topk_batch(
                tokens, counts, valid, qtok, qmask, metric="cosine", limit=10,
                chunk=chunk)
            np.testing.assert_array_equal(np.asarray(whole[0]), np.asarray(part[0]))
            np.testing.assert_allclose(
                np.asarray(whole[1]), np.asarray(part[1]), rtol=1e-6, atol=1e-6)
            assert bool(np.asarray(part[2]).all())

    def test_non_divisible_chunk_no_duplicates(self):
        rng = np.random.default_rng(37)
        n, t, d = 130, 2, 8
        tokens = jnp.asarray(rng.normal(size=(n, t, d)).astype(np.float32))
        counts = jnp.full(n, t, jnp.int32)
        valid = jnp.ones(n, bool)
        qtok = jnp.asarray(rng.normal(size=(2, 2, d)).astype(np.float32))
        qmask = jnp.ones((2, 2), bool)
        slots, _scores, ok = maxsim_ops.maxsim_full_topk_batch(
            tokens, counts, valid, qtok, qmask, metric="l2", limit=20, chunk=64)
        arr = np.asarray(slots)
        for row in arr:
            live = row[row >= 0]
            assert len(set(live.tolist())) == len(live)
        assert bool(np.asarray(ok).all())


class TestBf16TokenResidency:
    def test_bf16_exact_corpus_is_bf16_resident_and_exact(self):
        rng = np.random.default_rng(41)
        col = vt.Collection(name="bm-bf16", dimensions=DIMS, metric="cosine",
                            normalize="none")
        col.put_many(_corpus(rng, bf16_exact=True))
        cache = col._scan_cache()
        tokens, _counts = cache.multi_vectors()
        assert tokens.dtype == jnp.bfloat16
        sets = _query_sets(rng, 4)
        batch = col.multi_vector_search_batch(sets, limit=5)
        for qs, got in zip(sets, batch):
            want = col.multi_vector_search(qs, limit=5)
            assert [r.id for r in got] == [r.id for r in want]
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w.score, rel=1e-5, abs=1e-6)

    def test_non_exact_corpus_stays_f32(self):
        rng = np.random.default_rng(43)
        col = vt.Collection(name="bm-f32", dimensions=DIMS, metric="cosine")
        col.put_many(_corpus(rng))
        tokens, _ = col._scan_cache().multi_vectors()
        assert tokens.dtype == jnp.float32


@pytest.fixture(scope="module")
def hybrid_cols():
    rng = np.random.default_rng(53)
    docs = _corpus(rng)
    flat = vt.Collection(name="bm-hyf", dimensions=DIMS, metric="cosine", index="flat")
    flat.put_many(docs)
    hnsw = vt.Collection(name="bm-hyh", dimensions=DIMS, metric="cosine", index="hnsw")
    hnsw.put_many(docs)
    return flat, hnsw


class TestHybridBatch:
    def _queries(self, rng, count):
        qs = rng.normal(size=(count, DIMS))
        return [list(map(float, q)) for q in qs]

    @pytest.mark.parametrize("gens", [
        None,
        ["funnel", "quantized"],
        [("funnel", {"candidates": 25, "stages": [16, 32]}), ("quantized", {"candidates": 30})],
        [("search", {"candidates": 20})],
    ])
    def test_exact_rerank_matches_single_flat(self, hybrid_cols, gens):
        flat, _ = hybrid_cols
        rng = np.random.default_rng(59)
        queries = self._queries(rng, 5)
        batch = flat.hybrid_search_batch(queries, limit=6, generators=gens)
        for q, got in zip(queries, batch):
            want = flat.hybrid_search(q, limit=6, generators=gens)
            assert [(r.id,) for r in got] == [(r.id,) for r in want]
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w.score, rel=1e-5, abs=1e-6)

    def test_exact_rerank_matches_single_hnsw(self, hybrid_cols):
        _, hnsw = hybrid_cols
        rng = np.random.default_rng(61)
        queries = self._queries(rng, 4)
        for gens in (None, [("hnsw", {"candidates": 40}), ("quantized", {"candidates": 40})]):
            batch = hnsw.hybrid_search_batch(queries, limit=5, generators=gens)
            for q, got in zip(queries, batch):
                want = hnsw.hybrid_search(q, limit=5, generators=gens)
                assert [r.id for r in got] == [r.id for r in want]

    def test_mv_rerank_matches_single(self, hybrid_cols):
        flat, hnsw = hybrid_cols
        rng = np.random.default_rng(67)
        queries = self._queries(rng, 4)
        qsets = _query_sets(rng, 4)
        for col in (flat, hnsw):
            batch = col.hybrid_search_batch(
                queries, limit=5, rerank=("multi_vector", qsets))
            for q, qs, got in zip(queries, qsets, batch):
                want = col.hybrid_search(q, limit=5, rerank=("multi_vector", qs))
                assert [r.id for r in got] == [r.id for r in want]
                for g, w in zip(got, want):
                    assert g.score == pytest.approx(w.score, rel=1e-4, abs=1e-5)

    def test_mv_rerank_with_metric_override(self, hybrid_cols):
        flat, _ = hybrid_cols
        rng = np.random.default_rng(71)
        queries = self._queries(rng, 3)
        qsets = _query_sets(rng, 3)
        batch = flat.hybrid_search_batch(
            queries, limit=4, rerank=("multi_vector", qsets, {"metric": "l2"}))
        for q, qs, got in zip(queries, qsets, batch):
            want = flat.hybrid_search(q, limit=4,
                                      rerank=("multi_vector", qs, {"metric": "l2"}))
            assert [r.id for r in got] == [r.id for r in want]

    def test_validation(self, hybrid_cols):
        flat, hnsw = hybrid_cols
        q = [[0.0] * DIMS]
        with pytest.raises(vt.errors.InvalidGenerator):
            flat.hybrid_search_batch(q, generators=[])
        with pytest.raises(vt.errors.UnknownGenerator):
            flat.hybrid_search_batch(q, generators=["nope"])
        with pytest.raises(vt.errors.HnswIndexRequired):
            flat.hybrid_search_batch(q, generators=["hnsw"])
        with pytest.raises(vt.errors.InvalidRerank):
            flat.hybrid_search_batch(q, rerank="bogus")
        with pytest.raises(vt.errors.InvalidMultiVector):
            # one token set for two queries
            flat.hybrid_search_batch([[0.0] * DIMS, [0.0] * DIMS] and q * 2,
                                     rerank=("multi_vector", [[[0.0] * DIMS]]))
        assert flat.hybrid_search_batch([]) == []

    def test_empty_collection(self):
        col = vt.Collection(name="bm-hye", dimensions=DIMS, metric="cosine")
        assert col.hybrid_search_batch([[0.0] * DIMS]) == [[]]


class TestDeviceMmr:
    @pytest.mark.parametrize("metric", ["cosine", "l2", "inner_product", "manhattan"])
    @pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
    def test_selection_matches_greedy_on_same_sims(self, metric, alpha):
        """Exact parity of the vectorized selection loop against a Python
        greedy loop over the SAME f32 similarity matrix (isolates selection
        semantics from f32-vs-f64 pair-scoring noise)."""
        from vettore_tpu.ops.mmr import mmr_select_batch, pairwise_similarity_batch

        rng = np.random.default_rng(73)
        B, k, final_k = 4, 12, 5
        vecs = rng.normal(size=(B, k, DIMS)).astype(np.float32)
        scores = rng.normal(size=(B, k)).astype(np.float32)
        valid = np.ones((B, k), bool)
        valid[0, -2:] = False
        sims = np.asarray(pairwise_similarity_batch(jnp.asarray(vecs), metric=metric))
        order = np.asarray(mmr_select_batch(
            jnp.asarray(scores), jnp.asarray(sims), jnp.asarray(valid),
            float(alpha), final_k=final_k))
        for b in range(B):
            remaining = [i for i in range(k) if valid[b, i]]
            selected = []
            for _ in range(final_k):
                best_idx, best = None, -np.inf
                for i in remaining:
                    red = max((sims[b, i, j] for j in selected), default=0.0)
                    val = alpha * scores[b, i] - (1.0 - alpha) * red
                    if val > best:
                        best_idx, best = i, val
                if best_idx is None:
                    break
                selected.append(best_idx)
                remaining.remove(best_idx)
            want = selected + [-1] * (final_k - len(selected))
            assert order[b].tolist() == want

    def test_matches_host_loop(self):
        """Integration parity vs the f64 host reference loop — query scores
        scaled to dominate any f32/f64 pair-similarity noise."""
        rng = np.random.default_rng(73)
        B, k, final_k = 4, 12, 5
        initial_lists, vec_blocks = [], []
        for b in range(B):
            vecs = rng.normal(size=(k, DIMS)).astype(np.float32)
            scores = 10.0 * rng.normal(size=k)
            initial_lists.append([(f"q{b}-c{i}", float(scores[i])) for i in range(k)])
            vec_blocks.append(vecs)
        vecs_arr = np.stack(vec_blocks)
        got = mmr_rerank_batch(initial_lists, vecs_arr, metric="cosine",
                               alpha=0.5, final_k=final_k)
        for b in range(B):
            pool = [(initial_lists[b][i][0], list(map(float, vec_blocks[b][i])))
                    for i in range(k)]
            want = mmr_rerank(initial_lists[b], pool, "cosine", 0.5, final_k)
            assert [i for i, _ in got[b]] == [i for i, _ in want]

    def test_ragged_and_short_lists(self):
        rng = np.random.default_rng(79)
        k = 6
        vecs = np.zeros((2, k, DIMS), np.float32)
        vecs[0, :3] = rng.normal(size=(3, DIMS))
        vecs[1, :k] = rng.normal(size=(k, DIMS))
        lists = [
            [(f"a{i}", float(i)) for i in range(3)],
            [(f"b{i}", float(-i)) for i in range(k)],
        ]
        got = mmr_rerank_batch(lists, vecs, metric="cosine", alpha=0.7, final_k=10)
        assert len(got[0]) == 3 and len(got[1]) == k
        for b, initial in enumerate(lists):
            pool = [(initial[i][0], list(map(float, vecs[b, i]))) for i in range(len(initial))]
            want = mmr_rerank(initial, pool, "cosine", 0.7, 10)
            assert [i for i, _ in got[b]] == [i for i, _ in want]

    def test_validation(self):
        with pytest.raises(vt.errors.UnknownMetric):
            mmr_rerank_batch([[("a", 1.0)]], np.zeros((1, 1, 4), np.float32),
                             metric="nope", alpha=0.5, final_k=2)
        with pytest.raises(vt.errors.InvalidMmrArgs):
            mmr_rerank_batch([[("a", 1.0)]], np.zeros((1, 1, 4), np.float32),
                             metric="cosine", alpha=1.5, final_k=2)
        with pytest.raises(vt.errors.InvalidMmrArgs):
            mmr_rerank_batch([[("a", 1.0)]], np.zeros((1, 1, 4), np.float32),
                             metric="cosine", alpha=0.5, final_k=0)
        assert mmr_rerank_batch([], np.zeros((0, 1, 4), np.float32),
                                metric="cosine", alpha=0.5, final_k=2) == []
