"""IVF index: routing build, approximate search, exactness-at-full-probe,
mutation semantics, collection integration.

The IVF index is a TPU-native extension (no reference counterpart; it fills
HNSW's role, hnsw.rs:292-333). Its contract: exact results below
``min_rows``; above, approximate with recall measured against the flat
oracle; with ``n_probe >= n_blocks`` every block is probed and results must
EQUAL the exact fused scan, ties included — the same "full-candidate
adaptive modes equal exact flat" discipline as
/root/reference/test/vector_adversarial_test.exs:376-421.
"""

from __future__ import annotations

import numpy as np
import pytest

import vettore_tpu as vt
from vettore_tpu.errors import InvalidIvfOptions, UnsupportedIvfMetric
from vettore_tpu.index.flat import FlatIndex
from vettore_tpu.index.ivf import IvfIndex, validate_options

RNG = np.random.default_rng(20_260_721)


def clustered(n, d, centers=32, radius=0.35, rng=RNG):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    a = rng.integers(0, centers, n)
    x = c[a] + np.float32(radius / np.sqrt(d)) * rng.standard_normal(
        (n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def ids_for(n):
    return [f"doc-{i:05d}" for i in range(n)]


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------


def test_option_validation_matrix():
    assert validate_options(None)["n_probe"] == 8
    assert validate_options({"n_probe": 4})["n_probe"] == 4
    for bad in (
        {"n_probe": 0}, {"n_probe": -1}, {"n_probe": True}, {"n_probe": 1 << 20},
        {"kmeans_iters": 0}, {"kmeans_iters": 65}, {"storage": "int4"},
        {"min_rows": 0}, {"rebuild_fraction": 0.0}, {"rebuild_fraction": 1.5},
        {"rebuild_fraction": True}, {"bogus": 1},
    ):
        with pytest.raises(InvalidIvfOptions):
            validate_options(bad)


def test_metric_restriction():
    for metric in ("cosine", "l2", "inner_product"):
        IvfIndex(metric)
    with pytest.raises(UnsupportedIvfMetric):
        IvfIndex("hamming")
    with pytest.raises(UnsupportedIvfMetric):
        IvfIndex("manhattan")


# ---------------------------------------------------------------------------
# small collections: exact delegation
# ---------------------------------------------------------------------------


def test_small_index_is_exact():
    x = clustered(200, 16)
    ids = ids_for(200)
    ivf = IvfIndex("cosine", {"min_rows": 4096})
    flat = FlatIndex("cosine")
    pairs = list(zip(ids, x))
    ivf.put_many(pairs)
    flat.put_many(pairs)
    assert not ivf.built
    for q in clustered(5, 16):
        assert ivf.search(q, 7) == flat.search(q, 7)


# ---------------------------------------------------------------------------
# built path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built_pair():
    n, d = 1536, 32
    x = clustered(n, d)
    ids = ids_for(n)
    ivf = IvfIndex("cosine", {"min_rows": 256, "n_probe": 6, "kmeans_iters": 3,
                              "storage": "f32"})
    flat = FlatIndex("cosine")
    ivf.put_matrix(ids, x)
    flat.put_matrix(ids, x)
    # queries near corpus rows (the realistic retrieval geometry — the same
    # perturbed-row scheme as the bench harness)
    rng = np.random.default_rng(7)
    qs = x[rng.integers(0, n, 16)] + np.float32(0.2 / np.sqrt(d)) * \
        rng.standard_normal((16, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return ivf, flat, x, ids, qs


def test_built_recall_against_flat(built_pair):
    ivf, flat, _x, _ids, qs = built_pair
    truth = flat.search_batch(qs, 10)
    got = ivf.search_batch(qs, 10)
    assert ivf.built
    overlaps = [
        len({id for id, _ in g} & {id for id, _ in t}) / 10
        for g, t in zip(got, truth)
    ]
    assert float(np.mean(overlaps)) >= 0.9


def test_full_probe_equals_exact_flat(built_pair):
    """n_probe >= n_blocks probes everything: results must equal the exact
    flat scan including raw values and (rank, id) tie order."""
    _ivf, flat, x, ids, qs = built_pair
    full = IvfIndex("cosine", {"min_rows": 256, "n_probe": 65_536,
                               "kmeans_iters": 2, "storage": "f32"})
    full.put_matrix(ids, x)
    truth = flat.search_batch(qs, 10)
    got = full.search_batch(qs, 10)
    for g, t in zip(got, truth):
        assert [id for id, _ in g] == [id for id, _ in t]
        np.testing.assert_allclose(
            [r for _, r in g], [r for _, r in t], rtol=1e-5, atol=1e-6)


def test_full_probe_tie_order():
    """Duplicate vectors force rank ties; full-probe IVF must break them by
    id exactly like the flat oracle (flat.rs:34-40)."""
    d = 16
    row = np.ones(d, np.float32) / np.sqrt(d)
    n = 512
    x = np.tile(row, (n, 1))
    ids = [f"tie-{i:04d}" for i in range(n)]
    ivf = IvfIndex("cosine", {"min_rows": 64, "n_probe": 65_536})
    flat = FlatIndex("cosine")
    ivf.put_matrix(ids, x)
    flat.put_matrix(ids, x)
    got = ivf.search(row, 5)
    assert got == flat.search(row, 5)
    assert [id for id, _ in got] == [f"tie-{i:04d}" for i in range(5)]


@pytest.mark.parametrize("metric", ["l2", "inner_product", "l2_squared"])
def test_full_probe_other_metrics(metric):
    n, d = 768, 24
    x = clustered(n, d)
    ids = ids_for(n)
    ivf = IvfIndex(metric, {"min_rows": 128, "n_probe": 65_536, "storage": "f32"})
    flat = FlatIndex(metric)
    ivf.put_matrix(ids, x)
    flat.put_matrix(ids, x)
    for q in clustered(4, d):
        got, want = ivf.search(q, 8), flat.search(q, 8)
        assert [i for i, _ in got] == [i for i, _ in want]
        np.testing.assert_allclose(
            [r for _, r in got], [r for _, r in want], rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# mutations after build
# ---------------------------------------------------------------------------


def test_insert_after_build_merges_tail(built_pair):
    ivf, _flat, x, ids, _qs = built_pair
    n, d = x.shape
    ivf2 = IvfIndex("cosine", {"min_rows": 256, "n_probe": 65_536,
                               "storage": "f32"})
    ivf2.put_matrix(ids, x)
    ivf2.search(x[0], 1)  # build is lazy: first search constructs
    assert ivf2.built
    fresh = clustered(8, d, rng=np.random.default_rng(99))
    fresh_ids = [f"new-{i}" for i in range(8)]
    ivf2.put_many(list(zip(fresh_ids, fresh)))
    # a fresh row must be findable immediately (exact tail scan)
    hits = ivf2.search(fresh[0], 3)
    assert hits[0][0] == "new-0"
    # and built rows still serve
    hits = ivf2.search(x[5], 3)
    assert hits[0][0] == ids[5]


def test_replace_after_build_uses_new_vector(built_pair):
    _ivf, _flat, x, ids, _qs = built_pair
    n, d = x.shape
    ivf2 = IvfIndex("cosine", {"min_rows": 256, "n_probe": 65_536,
                               "storage": "f32"})
    ivf2.put_matrix(ids, x)
    target = -x[7] / np.linalg.norm(x[7])
    ivf2.put(ids[7], target)
    hits = ivf2.search(target, 1)
    assert hits[0][0] == ids[7]
    # the OLD vector location must not resurface under its id
    hits_old = ivf2.search(x[7], 5)
    returned = {id for id, _ in hits_old}
    if ids[7] in returned:  # only legal if the new vector genuinely ranks
        raw = dict(hits_old)[ids[7]]
        assert raw == pytest.approx(float(x[7] @ target), abs=1e-3)


def test_delete_after_build_excludes_id(built_pair):
    _ivf, flat, x, ids, _qs = built_pair
    ivf2 = IvfIndex("cosine", {"min_rows": 256, "n_probe": 65_536,
                               "storage": "f32"})
    ivf2.put_matrix(ids, x)
    ivf2.delete(ids[3])
    hits = ivf2.search(x[3], 5)
    assert all(id != ids[3] for id, _ in hits)
    assert len(ivf2) == len(ids) - 1


def test_rebuild_trigger_after_heavy_mutation():
    n, d = 1024, 16
    x = clustered(n, d)
    ids = ids_for(n)
    ivf = IvfIndex("cosine", {"min_rows": 128, "n_probe": 65_536,
                              "rebuild_fraction": 0.1, "storage": "f32"})
    ivf.put_matrix(ids, x)
    ivf.search(x[0], 1)
    assert ivf.built
    first_tail = ivf._tail
    extra = clustered(256, d, rng=np.random.default_rng(5))
    extra_ids = [f"x-{i}" for i in range(256)]
    ivf.put_many(list(zip(extra_ids, extra)))
    # 256 > max(64, 0.1 * 1024): next search must rebuild (tail folded in)
    ivf.search(x[0], 3)
    assert ivf._tail is None or not len(ivf._tail)
    assert len(ivf._block_slot_of) == n + 256
    del first_tail


def test_delete_everything_resets():
    n, d = 512, 8
    x = clustered(n, d)
    ids = ids_for(n)
    ivf = IvfIndex("cosine", {"min_rows": 64, "n_probe": 4})
    ivf.put_matrix(ids, x)
    ivf.search(x[0], 1)
    for id in ids:
        ivf.delete(id)
    assert len(ivf) == 0
    assert not ivf.built
    assert ivf.search(x[0], 3) == []


# ---------------------------------------------------------------------------
# collection integration
# ---------------------------------------------------------------------------


def test_collection_ivf_end_to_end(tmp_path):
    n, d = 1024, 24
    x = clustered(n, d)
    ids = ids_for(n)
    col = vt.Collection(name="ivf-col", dimensions=d, metric="cosine",
                        index="ivf",
                        index_options={"min_rows": 128, "n_probe": 65_536})
    col.put_matrix(ids, x)
    res = col.search(x[11], limit=5)
    assert res[0].id == ids[11]
    # default ivf storage is bf16: raw values carry ~1e-2 storage noise
    assert res[0].score == pytest.approx(1.0, abs=2e-2)

    # snapshot round-trip rebuilds the index from canonical records
    snap = tmp_path / "ivf.snap"
    col.snapshot(str(snap))
    loaded = vt.load_snapshot(str(snap))
    assert loaded.index_kind == "ivf"
    res2 = loaded.search(x[11], limit=5)
    assert [r.id for r in res2] == [r.id for r in res]
    loaded.close()

    # hybrid default generators on an ivf collection: [search, quantized]
    hits = col.hybrid_search(x[11], limit=5)
    assert hits[0].id == ids[11]
    col.close()


def test_collection_ivf_index_override_on_load(tmp_path):
    n, d = 300, 12
    x = clustered(n, d)
    col = vt.Collection(name="c", dimensions=d, metric="cosine", index="flat")
    col.put_many([
        {"id": f"r{i}", "vector": [float(v) for v in x[i]]} for i in range(n)
    ])
    snap = tmp_path / "c.snap"
    col.snapshot(str(snap))
    loaded = vt.load_snapshot(str(snap), index="ivf",
                              index_options={"min_rows": 64, "n_probe": 65_536})
    assert loaded.index_kind == "ivf"
    res = loaded.search([float(v) for v in x[42]], limit=3)
    assert res[0].id == "r42"
    loaded.close()
    col.close()


# ---------------------------------------------------------------------------
# n_probe="auto" (build-time recall tuning)
# ---------------------------------------------------------------------------


def uniform(n, d, rng):
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def test_auto_option_validation():
    assert validate_options({"n_probe": "auto"})["n_probe"] == "auto"
    assert validate_options(None)["target_recall"] == 0.95
    for bad in (
        {"n_probe": "Auto"}, {"n_probe": "all"}, {"target_recall": 0.0},
        {"target_recall": 1.5}, {"target_recall": True},
        {"target_recall": "high"},
    ):
        with pytest.raises(InvalidIvfOptions):
            validate_options(bad)


def _auto_built(x, target=0.9):
    ivf = IvfIndex("cosine", {"min_rows": 256, "n_probe": "auto",
                              "kmeans_iters": 3, "storage": "f32",
                              "target_recall": target})
    ids = ids_for(x.shape[0])
    ivf.put_matrix(ids, x)
    ivf.search_batch(x[:1], 1)  # triggers build + tune
    assert ivf.built and ivf.tuned is not None
    return ivf


def test_auto_n_probe_meets_target_on_clustered():
    n, d = 1536, 32
    x = clustered(n, d, rng=np.random.default_rng(5))
    ivf = _auto_built(x)
    p = ivf.effective_n_probe()
    assert isinstance(p, int) and 1 <= p <= n // 64
    assert ivf.tuned["n_probe"] == p and ivf.tuned["target"] == 0.9
    assert ivf.tuned["recall_at_10"] >= 0.9
    # the tuned probe holds up on held-out perturbed queries too
    flat = FlatIndex("cosine")
    flat.put_matrix(ids_for(n), x)
    rng = np.random.default_rng(9)
    qs = x[rng.integers(0, n, 16)] + np.float32(0.2 / np.sqrt(d)) * \
        rng.standard_normal((16, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    truth = flat.search_batch(qs, 10)
    got = ivf.search_batch(qs, 10)
    overlaps = [
        len({id for id, _ in g} & {id for id, _ in t}) / 10
        for g, t in zip(got, truth)
    ]
    assert float(np.mean(overlaps)) >= 0.8


def test_auto_n_probe_escalates_on_hard_corpus():
    """A structureless corpus needs more probes for the same target: auto
    must pick a larger n_probe on the uniform sphere than on the clustered
    corpus (the round-4 verdict's 'recall is only proven on a friendly
    corpus' gap, VERDICT.md item 4)."""
    n, d = 1536, 32
    easy = _auto_built(clustered(n, d, rng=np.random.default_rng(5)))
    hard = _auto_built(uniform(n, d, np.random.default_rng(5)))
    assert hard.tuned["n_probe"] > easy.tuned["n_probe"]
    # and the pick still meets (or ends at the every-block cap chasing)
    # the target on the tuning sample
    ngb = n // 64
    assert hard.tuned["recall_at_10"] >= 0.9 or hard.tuned["n_probe"] == ngb


def test_auto_n_probe_retunes_on_rebuild():
    n, d = 1024, 16
    rng = np.random.default_rng(13)
    ivf = _auto_built(clustered(n, d, rng=rng))
    first = dict(ivf.tuned)
    # heavy mutation forces a rebuild -> a fresh tune on the new geometry
    extra = uniform(512, d, rng)
    ivf.put_matrix([f"new-{i:04d}" for i in range(512)], extra)
    ivf.search_batch(extra[:1], 1)
    assert ivf.tuned is not None and ivf.tuned["target"] == first["target"]
    assert ivf._built_version == ivf._version


def test_auto_n_probe_snapshot_round_trip(tmp_path):
    n, d = 640, 16
    x = clustered(n, d, rng=np.random.default_rng(17))
    col = vt.Collection(name="auto", dimensions=d, metric="cosine",
                        index="ivf",
                        index_options={"min_rows": 64, "n_probe": "auto",
                                       "storage": "f32",
                                       "target_recall": 0.9})
    col.put_many([
        {"id": f"r{i:04d}", "vector": [float(v) for v in x[i]]}
        for i in range(n)
    ])
    res = col.search([float(v) for v in x[7]], limit=5)
    assert len(res) == 5
    snap = tmp_path / "auto.snap"
    col.snapshot(str(snap))
    loaded = vt.load_snapshot(str(snap))
    assert loaded.index_kind == "ivf"
    assert loaded.index.params["n_probe"] == "auto"
    # the rebuild re-runs k-means + the tune deterministically: the loaded
    # collection answers identically, including the re-tuned probe count
    res2 = loaded.search([float(v) for v in x[7]], limit=5)
    assert [(r.id, r.score) for r in res2] == [(r.id, r.score) for r in res]
    loaded.index._ensure_built()
    assert loaded.index.tuned == col.index.tuned
    loaded.close()
    col.close()
