"""IVF recall-vs-n_probe curves across corpus hardness at 1M x 768 cosine.

VERDICT r4 item 4: the IVF headline recall (0.9762 at n_probe=4) was only
proven on the bench's friendly clustered corpus — the exact geometry k-means
loves. This probe sweeps n_probe over three corpora of increasing hardness
(the bench corpus, a half-structure variant at 2x the cluster radius, and a
structureless uniform sphere), recording recall@10 vs the exact f32 scan
plus batched QPS per point, AND what ``n_probe="auto"`` (index/ivf.py:
_tune_n_probe — smallest probe whose stored-row-sample recall meets the
target) would pick on each corpus vs the held-out recall at that pick.

Everything is device-generated (vettore_tpu/synth.py) and runs the same ops
kernels the IvfIndex dispatches (ops/ivf.py). Writes
docs/ivf_recall_sweep.json.
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

from vettore_tpu import synth
from vettore_tpu.ops import ivf as ops_ivf
from vettore_tpu.ops.ivf import GROUP
from vettore_tpu.ops.transport import fetch_barrier

N = int(os.environ.get("IVF_SWEEP_N", 1_000_448))  # multiple of 1024
D = int(os.environ.get("IVF_SWEEP_D", 768))
B, K = int(os.environ.get("IVF_SWEEP_B", 512)), 10
SEED = 20_260_721
SWEEP = (1, 2, 4, 8, 16, 32, 64, 128)
TARGET = 0.95
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


@jax.jit
def exact_topk(x, q):
    s = jnp.dot(q, x.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, K)[1]


def build(x):
    """k-means routing layout (index/ivf.py:rebuild, ops-level): returns
    (state tuple for ivf_search, perm block-slot -> original row)."""
    valid = jnp.ones(N, bool)
    assign = ops_ivf.kmeans_assign(x, valid, n_cent=N // GROUP, iters=4,
                                   metric="cosine")
    perm = jnp.argsort(assign, stable=True)
    xs = x[perm]
    bcb, csq, bbias, xsq, bias = ops_ivf.build_blocks(xs, valid, metric="cosine")
    xb = xs.astype(jnp.bfloat16)  # the index's default storage
    lex = perm.astype(jnp.int32)  # row order doubles as lex order here
    return (xb, xsq, bias, lex, bcb, csq, bbias), np.asarray(perm)


def recall_and_qps(state, perm, qdev, truth, nprobe, iters=8):
    slots, _raws, ranks = ops_ivf.ivf_search(
        *state, qdev, metric="cosine", nprobe=nprobe, k=K)
    rows = perm[np.maximum(np.asarray(slots), 0)]
    ok = np.isfinite(np.asarray(ranks))
    rec = float(np.mean([
        len({int(r) for r, o in zip(rows[b], ok[b]) if o}
            & set(truth[b].tolist())) / K
        for b in range(B)
    ]))
    out = None
    t0 = time.perf_counter()
    for i in range(iters):
        out = ops_ivf.ivf_search(*state, qdev, metric="cosine",
                                 nprobe=nprobe, k=K)
    fetch_barrier(out[0])
    qps = B * iters / (time.perf_counter() - t0)
    return rec, qps


def auto_pick(state, perm, x, truth_fn):
    """What n_probe='auto' picks: recall of a stored-row sample vs exact,
    smallest probe meeting TARGET (index/ivf.py:_tune_n_probe rule)."""
    pick_rows = np.linspace(0, N - 1, 64).astype(np.int64)
    qs = x[jnp.asarray(pick_rows)]
    truth = np.asarray(truth_fn(qs))
    slots_truth = [set(t.tolist()) for t in truth]
    for p in SWEEP:
        slots, _raws, ranks = ops_ivf.ivf_search(
            *state, qs, metric="cosine", nprobe=p, k=K)
        rows = perm[np.maximum(np.asarray(slots), 0)]
        ok = np.isfinite(np.asarray(ranks))
        rec = float(np.mean([
            len({int(r) for r, o in zip(rows[b], ok[b]) if o} & slots_truth[b]) / K
            for b in range(len(pick_rows))
        ]))
        if rec >= TARGET or p == SWEEP[-1]:
            return p, rec
    return SWEEP[-1], rec


def run_corpus(name, gen, noise):
    phase(f"[{name}] corpus")
    x = gen()
    fetch_barrier(x)
    q = synth.perturbed_queries(x, B, noise, SEED + 1)
    phase(f"[{name}] ground truth")
    truth = np.asarray(exact_topk(x, q))
    phase(f"[{name}] build")
    t0 = time.perf_counter()
    state, perm = build(x)
    fetch_barrier(state[0])
    build_s = time.perf_counter() - t0
    phase(f"[{name}] built in {build_s:.1f}s; sweep")
    curve = []
    for p in SWEEP:
        rec, qps = recall_and_qps(state, perm, q, truth, p)
        curve.append({"n_probe": p, "recall_at_10": round(rec, 4),
                      "qps": round(qps, 1)})
        phase(f"[{name}]   n_probe={p}: recall@10={rec:.4f} qps={qps:.0f}")
        if rec >= 0.999 and p >= 8:
            break
    a_p, a_rec = auto_pick(state, perm, x,
                           lambda qs: exact_topk(x, qs))
    held = next((c for c in curve if c["n_probe"] == a_p), None)
    phase(f"[{name}] auto pick: n_probe={a_p} (sample recall {a_rec:.4f}, "
          f"held-out {held and held['recall_at_10']})")
    return {
        "corpus": name, "build_s": round(build_s, 1), "curve": curve,
        "auto": {"target": TARGET, "n_probe": a_p,
                 "sample_recall_at_10": round(a_rec, 4),
                 "held_out_recall_at_10": held and held["recall_at_10"]},
    }


def main():
    results = [
        run_corpus("clustered(10000,r0.4)",
                   lambda: synth.clustered(N, D, 10_000, 0.4, SEED), 0.4),
        run_corpus("clustered(10000,r0.8)",
                   lambda: synth.clustered(N, D, 10_000, 0.8, SEED + 2), 0.8),
        run_corpus("uniform_sphere",
                   lambda: synth.uniform_sphere(N, D, SEED + 3), 0.4),
    ]
    out = {"scale": f"{N}x{D}", "metric": "cosine", "batch": B,
           "storage": "bf16", "kmeans_iters": 4, "sweep": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ivf_recall_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    phase(f"wrote {path}")


if __name__ == "__main__":
    main()
