"""Search-kernel experiments over a saved graph: W / traversal / chunk sweep."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.index.hnsw_device import _search_kernel, step_bound


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="/tmp/graph300k.npz")
    p.add_argument("--ws", default="8,16,32")
    p.add_argument("--chunks", default="128,256")
    p.add_argument("--ef", type=int, default=64)
    p.add_argument("--trav", default="bf16,f32")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    z = np.load(args.graph)
    x = jnp.asarray(z["x"])
    xb16 = x.astype(jnp.bfloat16)
    a0 = jnp.asarray(z["a0"])
    up_index = jnp.asarray(z["up_index"])
    up_adj = jnp.asarray(z["up_adj"])
    lex_rank = jnp.asarray(z["lex_rank"])
    entry_slot = jnp.int32(int(z["entry_slot"]))
    entry_level = jnp.int32(int(z["entry_level"]))
    lmax = int(z["lmax"])
    q = z["queries"]
    gt = z["gt"]
    n = x.shape[0]
    print(f"graph n={n} lmax={lmax} queries={q.shape[0]} (build was {float(z['build_s']):.0f}s)",
          flush=True)

    def run(W, chunk, trav, ef):
        xb = xb16 if trav == "bf16" else None
        ms = step_bound(ef, W)
        ids_all = []
        # compile
        qc = jnp.asarray(q[:chunk])
        out = _search_kernel(x, a0, up_index, up_adj, lex_rank, entry_slot,
                             entry_level, qc, metric="cosine", lmax=lmax, ef=ef,
                             limit=10, max_steps=ms, xb=xb, expand_w=W)
        jax.block_until_ready(out)
        nq = (q.shape[0] // chunk) * chunk
        t0 = time.time()
        for _ in range(args.reps):
            outs = []
            for s in range(0, nq, chunk):
                outs.append(_search_kernel(
                    x, a0, up_index, up_adj, lex_rank, entry_slot, entry_level,
                    jnp.asarray(q[s:s+chunk]), metric="cosine", lmax=lmax,
                    ef=ef, limit=10, max_steps=ms, xb=xb, expand_w=W))
            jax.block_until_ready(outs)
        dt = (time.time() - t0) / args.reps
        qps = nq / dt
        ids = np.concatenate([np.asarray(o[0]) for o in outs])
        rec = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(nq)])
        print(f"W={W:3d} chunk={chunk:4d} trav={trav:4s} ef={ef:4d} "
              f"steps<={ms:3d} qps={qps:8.1f} recall@10={rec:.4f}", flush=True)

    for trav in args.trav.split(","):
        for W in [int(w) for w in args.ws.split(",")]:
            for chunk in [int(c) for c in args.chunks.split(",")]:
                run(W, chunk, trav, args.ef)


if __name__ == "__main__":
    main()
