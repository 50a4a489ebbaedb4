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
B, QT, LIMIT = 64, 4, 10
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    phase("device token block build (bf16)")
    key = jax.random.PRNGKey(7)
    docs = jax.random.normal(key, (N, D), dtype=jnp.float32)
    docs = docs / jnp.linalg.norm(docs, axis=1, keepdims=True)
    noise = 0.3 / np.sqrt(D)

    def make_tokens(docs):
        tok = docs[:, None, :] + noise * jax.random.normal(
            jax.random.PRNGKey(8), (N, T, D), dtype=jnp.float32)
        return tok.astype(jnp.bfloat16)

    tokens = jax.jit(make_tokens, donate_argnums=())(docs)
    fetch_barrier(tokens)
    counts = jnp.full((N,), T, jnp.int32)
    valid = jnp.ones((N,), bool)
    phase(f"block resident: {N}x{T}x{D} bf16 = "
          f"{N * T * D * 2 / 2**30:.1f} GiB")

    rngq = np.random.default_rng(9)
    qdocs = np.asarray(docs[rngq.integers(0, N, 2 * B)])
    qtok = qdocs[:, None, :] + np.float32(noise) * rngq.standard_normal(
        (2 * B, QT, D), dtype=np.float32)
    qmask = np.ones((2 * B, QT), bool)
    del docs

    chunk = _mv_chunk(N, B, QT, T)
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
    valid_sub = jnp.arange(N) < sub_n
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
    result = {
        "docs": N, "tokens_per_doc": T, "dims": D, "storage": "bf16",
        "hbm_gib": round(N * T * D * 2 / 2**30, 1),
        "batch": B, "chunk": chunk,
        "exact_maxsim_qps": round(qps, 1),
        "ms_per_batch": round(dt * 1000, 1),
        "host_subset_agreement": agree,
        "ok": bool(np.asarray(ok).all()),
        "score_sample": float(sc[0, 0]),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "mv_1m_capacity.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    phase(f"wrote {out_path}: {result}")


if __name__ == "__main__":
    main()
