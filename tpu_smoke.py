"""Real-TPU smoke gate: every search mode + the fused Pallas kernel +
device HNSW on the actual chip, asserted against host oracles.

The CPU test suite (tests/, forced to the virtual CPU backend) runs the
Pallas kernel interpreted and never exercises the Mosaic compile path or the
device HNSW kernels on hardware. This script is the on-chip counterpart of
the reference's per-mode CI benchmark gate
(/root/reference/.github/workflows/ci.yml:67-76): small corpus, every mode,
hard assertions, minutes not hours.

Run (NO JAX_PLATFORMS=cpu):  python tpu_smoke.py
Exit code 0 = green.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    import jax

    backend = jax.default_backend()
    print(f"[smoke] backend={backend} devices={jax.devices()}", flush=True)
    if backend == "cpu":
        print("[smoke] WARNING: running on CPU — this is NOT the hardware gate")

    import vettore_tpu as vt
    from vettore_tpu.ops import scan_host

    rng = np.random.default_rng(20_260_721)
    n, d = 6_000, 128
    centers = rng.normal(size=(60, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    data = centers[rng.integers(0, 60, n)] + (0.4 / np.sqrt(d)) * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    ids = [f"doc-{i:05d}" for i in range(n)]
    records = [{"id": id, "vector": [float(v) for v in row]}
               for id, row in zip(ids, data)]
    queries = data[rng.integers(0, n, 16)] + (0.4 / np.sqrt(d)) * rng.normal(
        size=(16, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    t0 = time.time()

    # ---- flat exact (fused group-min scan: n=6000 > 1024 threshold) vs host
    col = vt.Collection(name="smoke", dimensions=d, metric="cosine", index="flat")
    col.put_many(records)
    pairs = [(id, data[i]) for i, id in enumerate(ids)]
    for q in queries[:4]:
        got = [(r.id, r.score) for r in col.search(list(q), limit=10)]
        want = scan_host.vector_top_k(pairs, np.asarray(q, np.float64), "cosine", d, 10)
        assert [g[0] for g in got] == [w[0] for w in want], (got, want)
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-4, (g, w)
    print(f"[smoke] flat/fused-scan parity ok ({time.time()-t0:.0f}s)", flush=True)

    # batched path agrees with single-query path
    single = [ [r.id for r in col.search(list(q), limit=5)] for q in queries[:4] ]
    batched = [[r.id for r in row] for row in col.search_batch(queries[:4], limit=5)]
    assert single == batched, (single, batched)

    # ---- funnel + quantized (single and batched) vs exact oracle
    truth = [[r.id for r in row] for row in col.search_batch(queries, limit=10)]
    fun = col.funnel_search_batch(queries, stages=[32, 64, 128], candidates=200,
                                  limit=10)
    overlap = np.mean([
        len(set(r.id for r in row) & set(t)) / 10 for row, t in zip(fun, truth)
    ])
    assert overlap >= 0.9, f"funnel overlap {overlap}"
    qtz = col.quantized_search_batch(queries, candidates=500, limit=10)
    overlap = np.mean([
        len(set(r.id for r in row) & set(t)) / 10 for row, t in zip(qtz, truth)
    ])
    assert overlap >= 0.9, f"quantized overlap {overlap}"
    print(f"[smoke] funnel+quantized ok ({time.time()-t0:.0f}s)", flush=True)

    # ---- device HNSW (bulk wave build + hub-seeded query kernel) vs exact
    ann = vt.Collection(name="smoke-ann", dimensions=d, metric="cosine",
                        index="hnsw",
                        index_options={"m": 8, "m0": 16, "ef_construction": 48,
                                       "ef_search": 32})
    ann.index.BULK_THRESHOLD = 2_000  # force the device wave-build path
    ann.put_many(records)
    hits = ann.search_batch(queries, limit=10)
    overlap = np.mean([
        len(set(r.id for r in row) & set(t)) / 10 for row, t in zip(hits, truth)
    ])
    assert overlap >= 0.9, f"hnsw overlap {overlap}"
    assert ann.search(list(data[17]), limit=1)[0].id == "doc-00017"
    print(f"[smoke] hnsw device build+query ok (overlap {overlap:.3f}, "
          f"{time.time()-t0:.0f}s)", flush=True)

    # ---- kNN-block bulk construction (hnsw_knn_build — the default build
    # at bench scale) on hardware: same recall gate as the wave build
    knn = vt.Collection(name="smoke-knn", dimensions=d, metric="cosine",
                        index="hnsw",
                        index_options={"m": 8, "m0": 16, "ef_construction": 48,
                                       "ef_search": 32, "build": "knn"})
    knn.index.BULK_THRESHOLD = 2_000
    knn.put_many(records)
    hits = knn.search_batch(queries, limit=10)
    overlap = np.mean([
        len(set(r.id for r in row) & set(t)) / 10 for row, t in zip(hits, truth)
    ])
    assert overlap >= 0.9, f"knn-build overlap {overlap}"
    assert knn.search(list(data[23]), limit=1)[0].id == "doc-00023"
    print(f"[smoke] hnsw knn-build ok (overlap {overlap:.3f}, "
          f"{time.time()-t0:.0f}s)", flush=True)

    # ---- multi-vector MaxSim + hybrid + MMR
    mv = vt.Collection(name="smoke-mv", dimensions=32, metric="cosine")
    mv_rng = np.random.default_rng(7)
    mv.put_many([
        {"id": f"mv-{i:03d}",
         "vectors": (mv_rng.normal(size=(4, 32)) + i % 7).tolist()}
        for i in range(300)
    ])
    qv = [list(v) for v in mv_rng.normal(size=(2, 32)) + 3]
    res = mv.multi_vector_search(qv, limit=5)
    assert len(res) == 5 and all(np.isfinite(r.score) for r in res)
    hyb = mv.hybrid_search(qv[0], limit=5, rerank=("multi_vector", qv))
    assert len(hyb) == 5
    from vettore_tpu.ops.mmr import mmr_rerank

    pool = [(r.id, list(np.asarray(mv.get(r.id).vector))) for r in hyb]
    reranked = mmr_rerank([(r.id, float(r.score)) for r in hyb], pool,
                          "cosine", 0.5, 3)
    assert len(reranked) == 3
    print(f"[smoke] maxsim+hybrid+mmr ok ({time.time()-t0:.0f}s)", flush=True)

    # ---- fused MaxSim Pallas scan (d=128, T pow2, cap%128==0 → engages
    # ops/maxsim.fused_maxsim_topk_batch, Mosaic-compiled) vs host oracle
    from vettore_tpu.ops import maxsim as maxsim_ops

    mvf = vt.Collection(name="smoke-mvf", dimensions=128, metric="cosine")
    mvf_rng = np.random.default_rng(11)
    mv_docs = [mvf_rng.normal(size=(int(mvf_rng.integers(1, 5)), 128))
               for _ in range(300)]
    mvf.put_many([
        {"id": f"mvf-{i:03d}", "vectors": toks.tolist()}
        for i, toks in enumerate(mv_docs)
    ])
    fcache = mvf._scan_cache()
    ftok, _ = fcache.multi_vectors()
    assert maxsim_ops.supports_fused(
        "cosine", int(ftok.shape[0]), int(ftok.shape[1]), 128, 4,
        ftok.dtype.itemsize), "smoke config must engage the fused MV scan"
    fq = [mvf_rng.normal(size=128).tolist() for _ in range(2)]
    fres = mvf.multi_vector_search(fq, limit=5)
    fdocs = [(f"mvf-{i:03d}", [list(t) for t in toks])
             for i, toks in enumerate(mv_docs)]
    fwant = maxsim_ops.top_k(fdocs, fq, "cosine", 5)
    assert [r.id for r in fres] == [w[0] for w in fwant], (fres, fwant)
    for r, w in zip(fres, fwant):
        assert abs(r.score - w[1]) < 1e-3, (r.id, r.score, w)
    print(f"[smoke] fused maxsim parity ok ({time.time()-t0:.0f}s)", flush=True)

    # ---- BATCHED fused MaxSim (b > 1, multi-token queries): the Mosaic
    # lowering of the per-query token reduction is shape-dependent (a lane
    # split that b=1 never exercises — it broke the round-5 bench's b=64
    # path while every b=1 gate stayed green), so the gate must compile a
    # real batch
    fqsets = [[mvf_rng.normal(size=128).tolist() for _ in range(3)]
              for _ in range(8)]
    fbatch = mvf.multi_vector_search_batch(fqsets, limit=5)
    for qs, row in zip(fqsets, fbatch):
        want = maxsim_ops.top_k(fdocs, qs, "cosine", 5)
        assert [r.id for r in row] == [w[0] for w in want], (row, want)
        for r, w in zip(row, want):
            assert abs(r.score - w[1]) < 1e-3, (r.id, r.score, w)
    print(f"[smoke] batched fused maxsim parity ok ({time.time()-t0:.0f}s)",
          flush=True)

    # ---- MUVERA-FDE candidate generation (device doc encoder + fused
    # candidate scan + exact subset rerank) recalls the exact MaxSim scan
    fexact = [r.id for r in fres]
    ffast = [r.id for r in mvf.multi_vector_search(fq, limit=5, candidates=64)]
    overlap = len(set(fexact) & set(ffast)) / 5
    assert overlap >= 0.8, f"muvera-fde overlap {overlap}"
    print(f"[smoke] muvera-fde candidates ok (overlap {overlap:.2f}, "
          f"{time.time()-t0:.0f}s)", flush=True)

    # ---- snapshot round-trip
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        col.snapshot(f"{tmp}/smoke.vsnap")
        loaded = vt.load_snapshot(f"{tmp}/smoke.vsnap")
        got = [r.id for r in loaded.search(list(queries[0]), limit=5)]
        want = [r.id for r in col.search(list(queries[0]), limit=5)]
        assert got == want
    print(f"[smoke] snapshot ok — ALL GREEN in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
