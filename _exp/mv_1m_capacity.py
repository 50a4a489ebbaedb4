"""1M-doc multi-vector (ColBERT) capacity rehearsal on one chip.

BASELINE config 5 scale: 1M docs x 32 token-vectors x 128d. The 8.2 GB bf16
token block cannot cross the tunnel within any bench budget (~100 s/1.5 GB),
so this rehearsal builds it ON DEVICE (docs + per-token noise, same
construction as bench.mv_caches) and drives the exact op the collection
dispatches (ops/maxsim.maxsim_full_topk_batch — the chunked streaming scan).
Writes docs/mv_1m_capacity.json: QPS + host-oracle agreement.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vettore_tpu.collection import _mv_chunk
from vettore_tpu.ops import maxsim as maxsim_ops
from vettore_tpu.ops.transport import fetch_barrier

N, T, D = 1_000_000, 32, 128
#: block capacity padded to the collection cache's tile multiple so the
#: fused FDE candidate kernel tiles (collection._cap_at_least discipline)
NPAD = -(-N // 1024) * 1024
B, QT, LIMIT = 64, 4, 10
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    phase("device token block build (bf16, clustered)")
    # clustered geometry matching bench.mv_caches / clustered_corpus: docs in
    # Gaussian clusters (10k centers, radius 0.4) — the representative
    # embedding-like distribution; a purely random corpus has near-tie
    # top-10s whose order is noise, not signal
    n_cent = 10_000
    sigma = np.float32(0.4 / np.sqrt(D))

    @jax.jit
    def make_docs():
        # one fused program so the eager centers/assign/noise temporaries
        # never coexist in HBM next to the 8 GB token block
        centers = jax.random.normal(jax.random.PRNGKey(17), (n_cent, D),
                                    dtype=jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(jax.random.PRNGKey(18), (N,), 0, n_cent)
        docs = centers[assign] + sigma * jax.random.normal(
            jax.random.PRNGKey(7), (N, D), dtype=jnp.float32)
        return docs / jnp.linalg.norm(docs, axis=1, keepdims=True)

    docs = make_docs()
    fetch_barrier(docs)
    noise = 0.3 / np.sqrt(D)

    def make_tokens(docs):
        tok = docs[:, None, :] + noise * jax.random.normal(
            jax.random.PRNGKey(8), (N, T, D), dtype=jnp.float32)
        tok = jnp.pad(tok, ((0, NPAD - N), (0, 0), (0, 0)))
        return tok.astype(jnp.bfloat16)

    tokens = jax.jit(make_tokens, donate_argnums=())(docs)
    fetch_barrier(tokens)
    counts = jnp.where(jnp.arange(NPAD) < N, T, 0).astype(jnp.int32)
    valid = jnp.arange(NPAD) < N
    phase(f"block resident: {NPAD}x{T}x{D} bf16 = "
          f"{NPAD * T * D * 2 / 2**30:.1f} GiB")

    rngq = np.random.default_rng(9)
    qdocs = np.asarray(docs[rngq.integers(0, N, 2 * B)])
    qtok = qdocs[:, None, :] + np.float32(noise) * rngq.standard_normal(
        (2 * B, QT, D), dtype=np.float32)
    qmask = np.ones((2 * B, QT), bool)
    del docs

    chunk = _mv_chunk(NPAD, B, QT, T)
    phase(f"chunk={chunk} streaming scan: compile + first batch")
    qt_dev = jnp.asarray(qtok)
    qm_dev = jnp.asarray(qmask)

    def dispatch(i):
        lo = (i % 2) * B
        return maxsim_ops.maxsim_full_topk_batch(
            tokens, counts, valid, qt_dev[lo:lo + B], qm_dev[lo:lo + B],
            metric="cosine", limit=LIMIT, chunk=chunk)

    slots, scores, ok = dispatch(0)
    fetch_barrier(slots)
    phase(f"first batch done (ok={bool(np.asarray(ok).all())})")

    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        out = dispatch(i)
    fetch_barrier(out[0])
    dt = (time.perf_counter() - t0) / iters
    qps = B / dt
    phase(f"warm: {dt * 1000:.1f} ms/batch ({qps:.1f} qps)")

    # host oracle: restrict the device scan to a 64k-doc slice via the
    # valid mask, then compare against the host MaxSim over that slice
    # (a full-corpus host oracle would be a 16 GB f32 einsum)
    phase("host-oracle spot check (subset-restricted dispatch)")
    sub_n = 65536
    valid_sub = jnp.arange(NPAD) < sub_n
    sl_sub, _sc, ok_sub = maxsim_ops.maxsim_full_topk_batch(
        tokens, counts, valid_sub, qt_dev[:2], qm_dev[:2],
        metric="cosine", limit=LIMIT, chunk=chunk)
    sl = np.asarray(sl_sub)
    sc = np.asarray(scores)
    tok_sub = np.asarray(tokens[:sub_n], np.float32)
    agree = []
    for qi in range(2):
        q = qtok[qi]  # [QT, D]
        sims = np.einsum("qd,ntd->nqt", q, tok_sub)
        qn = np.linalg.norm(q, axis=1)[None, :, None]
        tn = np.linalg.norm(tok_sub, axis=2)[:, None, :]
        cos = sims / np.maximum(qn * tn, 1e-30)
        tot = np.clip(cos, -1.0, 1.0).max(axis=2).sum(axis=1)
        want = np.argsort(-tot, kind="stable")[:LIMIT]
        inter = len(set(want.tolist()) & set(int(g) for g in sl[qi]))
        agree.append(inter / LIMIT)
    # ---- fused Pallas pass (ops/maxsim.fused_maxsim_topk_batch): what the
    # collection actually dispatches at these shapes (supports_fused is
    # true), measured against the chunked XLA stream above — VERDICT r4
    # item 3's at-scale number
    # uniform=True: every doc stores exactly T tokens (this corpus) — the
    # masked variant's [NT, 1] operands pad 128x in HBM (15 GiB each at
    # this scale) and cannot compile on one chip
    assert maxsim_ops.supports_fused("cosine", NPAD, T, D, B * QT, 2,
                                     uniform=True)
    phase("fused pallas pass: compile + first batch")

    def fused_dispatch(i):
        lo = (i % 2) * B
        return maxsim_ops.fused_maxsim_topk_batch(
            tokens, counts, valid, qt_dev[lo:lo + B], qm_dev[lo:lo + B],
            metric="cosine", limit=LIMIT, t=T, b=B, uniform=True)

    fu_slots, _fu_scores, fu_ok = fused_dispatch(0)
    fetch_barrier(fu_slots)
    t0 = time.perf_counter()
    fu_iters = 8
    for i in range(fu_iters):
        fu_out = fused_dispatch(i)
    fetch_barrier(fu_out[0])
    fu_dt = (time.perf_counter() - t0) / fu_iters
    fu_qps = B / fu_dt
    fu_sl = np.asarray(fu_slots)
    ex_sl0 = np.asarray(slots)
    fu_overlap = float(np.mean([
        len(set(fu_sl[b].tolist()) & set(ex_sl0[b].tolist())) / LIMIT
        for b in range(B)
    ]))
    phase(f"fused: {fu_dt * 1000:.1f} ms/batch ({fu_qps:.1f} qps), "
          f"overlap@10 vs xla stream {fu_overlap:.4f}, "
          f"ok={bool(np.asarray(fu_ok).all())}")

    # ---- MUVERA-FDE candidate generation + exact subset rerank (the
    # multi_vector_search(candidates=...) serving path at 1M scale):
    # device doc-FDE encode, fused FDE scan for the top-512, exact MaxSim
    # of the winners — vs the exact scan's slots from dispatch(0)
    phase("muvera-fde: device doc encode")
    from vettore_tpu.ops import muvera_fde

    cfg = muvera_fde.normalize_config(muvera_fde.default_config(D), D)
    t0 = time.perf_counter()
    fde16 = muvera_fde.encode_documents_device(
        tokens, counts, cfg, out_dtype=jnp.bfloat16)
    fetch_barrier(fde16)
    fde_encode_s = time.perf_counter() - t0
    fde_xsq = muvera_fde.block_sq_norms(fde16)
    fde_bias = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
    phase(f"fde block {fde16.shape} bf16 = "
          f"{fde16.size * 2 / 2**30:.1f} GiB in {fde_encode_s:.1f}s")

    qfde_all = jnp.asarray(muvera_fde.encode_query_sets_host(
        [qtok[i] for i in range(2 * B)], cfg))
    cand = 512

    def fde_dispatch(i):
        lo = (i % 2) * B
        slots_c, ok_c = muvera_fde.fde_candidates(
            fde16, fde_xsq, fde_bias, qfde_all[lo:lo + B], count=cand)
        return maxsim_ops.maxsim_subset_topk_batch(
            tokens, counts, jnp.maximum(slots_c, 0), slots_c >= 0,
            qt_dev[lo:lo + B], qm_dev[lo:lo + B], metric="cosine",
            limit=LIMIT)

    f_slots, _f_scores, f_ok = fde_dispatch(0)
    fetch_barrier(f_slots)
    t0 = time.perf_counter()
    iters = 8
    for i in range(iters):
        f_out = fde_dispatch(i)
    fetch_barrier(f_out[0])
    f_dt = (time.perf_counter() - t0) / iters
    f_qps = B / f_dt
    f_sl = np.asarray(f_slots)
    ex_sl = np.asarray(slots)
    f_overlap = float(np.mean([
        len(set(f_sl[b].tolist()) & set(ex_sl[b].tolist())) / LIMIT
        for b in range(B)
    ]))
    top1 = float(np.mean([
        1.0 if int(ex_sl[b, 0]) in set(f_sl[b].tolist()) else 0.0
        for b in range(B)
    ]))
    phase(f"muvera-fde: {f_dt * 1000:.1f} ms/batch ({f_qps:.1f} qps), "
          f"overlap@10 {f_overlap:.4f}, exact-top1-recalled {top1:.3f}, "
          f"ok={bool(np.asarray(f_ok).all())}")

    result = {
        "docs": N, "tokens_per_doc": T, "dims": D, "storage": "bf16",
        "hbm_gib": round(NPAD * T * D * 2 / 2**30, 1),
        "batch": B, "chunk": chunk,
        # the serving path (collection dispatches the fused pass at these
        # shapes); the XLA stream is the pre-fusion comparison point
        "exact_maxsim_qps": round(fu_qps, 1),
        "ms_per_batch": round(fu_dt * 1000, 1),
        "fused_pallas": {
            "qps": round(fu_qps, 1), "ms_per_batch": round(fu_dt * 1000, 1),
            "overlap_at_10_vs_xla_stream": round(fu_overlap, 4),
            "ok": bool(np.asarray(fu_ok).all()),
        },
        "xla_stream": {
            "qps": round(qps, 1), "ms_per_batch": round(dt * 1000, 1),
        },
        "host_subset_agreement": agree,
        "ok": bool(np.asarray(ok).all()) and bool(np.asarray(fu_ok).all()),
        "score_sample": float(sc[0, 0]),
        "muvera_fde": {
            "candidates": cand,
            "fde_dims": int(fde16.shape[1]),
            "fde_hbm_gib": round(fde16.size * 2 / 2**30, 2),
            "fde_encode_s": round(fde_encode_s, 1),
            "qps": round(f_qps, 1),
            "ms_per_batch": round(f_dt * 1000, 1),
            "overlap_at_10_vs_exact": round(f_overlap, 4),
            "exact_top1_recalled": round(top1, 4),
            "ok": bool(np.asarray(f_ok).all()),
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "mv_1m_capacity.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    phase(f"wrote {out_path}: {result}")


if __name__ == "__main__":
    main()
