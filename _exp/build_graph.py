"""Experiment harness: build a clustered-corpus HNSW graph on the real TPU
and persist it (adjacency + vectors + ground truth) for search-kernel
iteration without paying the build each time."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n, d, seed=0, centers=None, radius=0.4):
    """Matches bench.py's clustered_corpus: noise NORM = radius (sigma scaled
    by 1/sqrt(d)), the geometry of real embedding corpora."""
    rng = np.random.default_rng(seed)
    centers = centers or max(n // 100, 1024)
    c = rng.normal(size=(centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    idx = rng.integers(0, centers, size=n)
    sigma = radius / np.sqrt(d)
    x = c[idx] + sigma * rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--out", default="/tmp/graph300k.npz")
    p.add_argument("--queries", type=int, default=1024)
    args = p.parse_args()

    from vettore_tpu.index.hnsw_build import bulk_build

    x = make_corpus(args.n, args.d)
    ids = [f"doc-{i:07d}" for i in range(args.n)]
    params = {"m": 16, "m0": 32, "ef_construction": 100, "max_level": 12}
    t0 = time.time()
    g = bulk_build("cosine", params, ids, x)
    build_s = time.time() - t0
    print(f"build {args.n}x{args.d}: {build_s:.1f}s", flush=True)

    # held-out queries: corpus points + noise at cluster-radius NORM (0.4) —
    # harder than bench r01's 0.2 so the recall gate actually bites
    rng = np.random.default_rng(7)
    base = x[rng.integers(0, args.n, size=args.queries)]
    sigma = 0.4 / np.sqrt(args.d)
    q = base + sigma * rng.normal(size=base.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # exact ground truth on device (by slot in the graph's own order)
    import jax
    import jax.numpy as jnp

    xd = g.x
    gt = np.zeros((args.queries, 10), dtype=np.int32)

    # x must be an ARGUMENT: a closed-over device array becomes a baked
    # program constant — a ~1GB literal shipped through the remote compiler
    @jax.jit
    def exact(xa, qb):
        dots = jnp.dot(qb, xa.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        _, top = jax.lax.top_k(dots, 10)
        return top

    for s in range(0, args.queries, 256):
        gt[s:s+256] = np.asarray(exact(xd, jnp.asarray(q[s:s+256])))
        print(f"gt {s+256}/{args.queries}", flush=True)

    t0 = time.time()
    host = {k: np.asarray(v) for k, v in
            [("x", g.x), ("a0", g.a0), ("up_index", g.up_index),
             ("up_adj", g.up_adj), ("lex_rank", g.lex_rank)]}
    print(f"device_get {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    np.savez(
        args.out, levels=np.asarray(g.levels), entry_slot=int(g.entry_slot),
        entry_level=int(g.entry_level), lmax=g.lmax, m=g.m, m0=g.m0,
        queries=q, gt=gt, build_s=build_s, **host,
    )
    print(f"saved {args.out} in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
