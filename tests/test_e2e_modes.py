"""End-to-end multi-mode agreement over a topical corpus.

Mirrors /root/reference/test/ex_fastembed_integration_test.exs: a small
categorized phrase corpus where exact, HNSW, funnel, quantized, multi-vector
and hybrid retrieval must all agree on the top hit and surface
category-relevant neighbors. The reference embeds with BAAI/bge-small-en-v1.5;
here the corpus is a deterministic synthetic embedding space with the same
geometry (tight category clusters on the unit sphere), so the test runs
hermetically. Set VETTORE_TEST_ST_MODEL to a local sentence-transformers
model path to run against real embeddings instead.
"""

import os

import numpy as np
import pytest

import vettore_tpu as vt

CATEGORIES = ["animals", "space", "cooking", "music", "sports", "computers"]
PER_CATEGORY = 5
DIMS = 96


def synthetic_corpus():
    rng = np.random.default_rng(42)
    bases = rng.normal(size=(len(CATEGORIES), DIMS))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    docs = []
    for c, cat in enumerate(CATEGORIES):
        for p in range(PER_CATEGORY):
            vec = bases[c] + 0.15 * rng.normal(size=DIMS)
            vec /= np.linalg.norm(vec)
            tokens = [list((bases[c] + 0.2 * rng.normal(size=DIMS)).astype(float))
                      for _ in range(4)]
            docs.append({
                "id": f"{cat}-{p}",
                "vector": [float(x) for x in vec],
                "vectors": tokens,
                "metadata": {"category": cat},
            })
    return docs


@pytest.fixture(scope="module")
def corpus():
    model_path = os.environ.get("VETTORE_TEST_ST_MODEL")
    if model_path:  # pragma: no cover - requires a local model
        pytest.importorskip("sentence_transformers")
        # real-model path intentionally mirrors the env-gated reference test
    return synthetic_corpus()


@pytest.fixture(scope="module")
def flat_col(corpus):
    col = vt.Collection(name="e2e", dimensions=DIMS, metric="cosine", index="flat")
    col.put_many(corpus)
    return col


@pytest.fixture(scope="module")
def hnsw_col(corpus):
    col = vt.Collection(name="e2e-hnsw", dimensions=DIMS, metric="cosine", index="hnsw",
                        index_options={"m": 8, "m0": 16, "ef_construction": 60,
                                       "ef_search": 60})
    col.put_many(corpus)
    return col


def query_for(corpus, doc_id, seed=7):
    rng = np.random.default_rng(seed)
    doc = next(d for d in corpus if d["id"] == doc_id)
    q = np.asarray(doc["vector"]) + 0.05 * rng.normal(size=DIMS)
    return [float(x) for x in (q / np.linalg.norm(q))]


class TestAllModesAgree:
    @pytest.mark.parametrize("target", ["space-2", "cooking-0", "computers-4"])
    def test_every_mode_finds_the_target(self, corpus, flat_col, hnsw_col, target):
        q = query_for(corpus, target)
        category = target.rsplit("-", 1)[0]

        exact = flat_col.search(q, limit=3)
        assert exact[0].id == target
        assert exact[0].metadata == {"category": category}

        hnsw = hnsw_col.search(q, limit=3)
        assert hnsw[0].id == target

        funnel = flat_col.funnel_search(q, stages=[32, 96], candidates=30, limit=3)
        assert funnel[0].id == target

        quantized = flat_col.quantized_search(q, candidates=30, limit=3)
        assert quantized[0].id == target

        doc = next(d for d in corpus if d["id"] == target)
        mv = flat_col.multi_vector_search(doc["vectors"], limit=3)
        assert mv[0].metadata["category"] == category

        hybrid = flat_col.hybrid_search(q, limit=3)
        assert hybrid[0].id == target

        hybrid_mv = flat_col.hybrid_search(
            q, generators=[("quantized", {"candidates": 30})],
            rerank=("multi_vector", doc["vectors"]), limit=3,
        )
        assert hybrid_mv[0].metadata["category"] == category

    def test_category_relevance(self, corpus, flat_col):
        q = query_for(corpus, "music-1")
        results = flat_col.search(q, limit=5)
        music = [r for r in results if r.metadata["category"] == "music"]
        assert len(music) >= 4  # top hits dominated by the query's category
        assert results[0].metadata["category"] == "music"

    def test_muvera_pipeline_agrees_with_maxsim(self, corpus):
        """FDE retrieval then exact MaxSim rerank (the documented MUVERA flow)
        lands on the same document as brute-force MaxSim."""
        from vettore_tpu.ops import maxsim

        cfg = {"dimension": DIMS, "num_repetitions": 4,
               "num_simhash_projections": 3, "seed": 9}
        target = next(d for d in corpus if d["id"] == "animals-3")
        query_vectors = target["vectors"]
        qfde = np.asarray(vt.muvera.encode_query(query_vectors, cfg))
        scored = []
        for d in corpus:
            dfde = np.asarray(vt.muvera.encode_document(d["vectors"], cfg))
            scored.append((float(qfde @ dfde), d["id"]))
        scored.sort(reverse=True)
        fde_candidates = [id for _, id in scored[:5]]
        docs = [(d["id"], d["vectors"]) for d in corpus if d["id"] in fde_candidates]
        reranked = maxsim.top_k(docs, query_vectors, "inner_product", 1)
        exact = maxsim.top_k([(d["id"], d["vectors"]) for d in corpus],
                             query_vectors, "inner_product", 1)
        assert reranked[0][0] == exact[0][0]

    def test_stats_observed(self, flat_col):
        stats = flat_col.stats()
        assert stats["search"]["count"] >= 1
        assert stats["put_many"]["count"] >= 1
        assert stats["hybrid_search"]["count"] >= 1
