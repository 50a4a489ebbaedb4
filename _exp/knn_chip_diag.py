"""On-chip kNN-build diagnosis at --n: edge recall of a0 rows vs true
top-10 (slot space), search recall at an ef sweep, and recall when the
beam is seeded with MORE hubs — localizes loss to candidate pools vs
navigation. Compiles are cached from prior runs."""
import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--queries", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vettore_tpu import synth
    from vettore_tpu.index import hnsw_device
    from vettore_tpu.index.hnsw_build import bulk_build
    from vettore_tpu.ops.transport import fetch_barrier

    n, d = args.n, args.d
    x_dev = synth.clustered(n, d, max(1024, n // 100), 0.4, 0)
    fetch_barrier(x_dev)
    ids = [f"doc-{i:07d}" for i in range(n)]
    params = {"m": 16, "m0": 32, "ef_construction": 100, "max_level": 12,
              "build": "knn"}
    t0 = time.time()
    g = bulk_build("cosine", params, ids, x_device=x_dev)
    fetch_barrier(g.a0)
    print(f"[diag] build {time.time() - t0:.1f}s", flush=True)

    @jax.jit
    def topk_slots(qs, x):
        s = jnp.dot(qs, x.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, 11)[1]

    # ---- edge recall on sampled slots
    rng = np.random.default_rng(1)
    sample = rng.integers(0, n, 256).astype(np.int32)
    svec = g.x[jnp.asarray(sample)]
    true_s = np.asarray(jax.device_get(topk_slots(svec, g.x)))
    a0 = np.asarray(jax.device_get(g.a0[jnp.asarray(sample)]))
    er = []
    for i, s in enumerate(sample):
        t10 = [j for j in true_s[i].tolist() if j != s][:10]
        er.append(len(set(t10) & set(a0[i].tolist())) / 10)
    print(f"[diag] edge recall@10: {np.mean(er):.4f}", flush=True)

    # ---- search recall, ef sweep
    q = np.asarray(synth.perturbed_queries(x_dev, args.queries, 0.4, 7))
    qd = jnp.asarray(q)
    gt = np.asarray(jax.device_get(topk_slots(qd, g.x)))[:, :10]
    hub_slots, hub_x = g.hubs(jnp.bfloat16)
    print(f"[diag] hubs: {hub_slots.shape[0]}", flush=True)
    for ef, w in ((16, 4), (64, 4), (256, 4), (64, 16)):
        slots, _raws, _ = jax.device_get(hnsw_device._search_kernel(
            g.x, g.a0, g.up_index, g.up_adj, g.lex_rank, g.entry_slot,
            g.entry_level, qd, metric="cosine", lmax=g.lmax, ef=ef, limit=10,
            max_steps=hnsw_device.step_bound(ef, w), xb=g.xb,
            hub_slots=hub_slots, hub_x=hub_x, expand_w=w,
        ))
        rec = np.mean([
            len(set(slots[i].tolist()) & set(gt[i].tolist())) / 10
            for i in range(len(q))
        ])
        print(f"[diag] ef={ef} W={w}: search recall@10 {rec:.4f}", flush=True)

    # ---- upper bound: 1-hop expansion from the true top-1's a0 row — if the
    # beam REACHED the right basin, how much of top-10 is one hop away?
    a0_top1 = np.asarray(jax.device_get(g.a0[jnp.asarray(gt[:, 0])]))
    hop = []
    for i in range(len(q)):
        reach = set(a0_top1[i].tolist()) | {int(gt[i, 0])}
        hop.append(len(set(gt[i].tolist()) & reach) / 10)
    print(f"[diag] top-10 within 1 hop of true top-1: {np.mean(hop):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
