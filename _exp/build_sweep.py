"""HNSW bulk-build throughput sweep on the real TPU (VERDICT r3 item 2:
1M cold build from ~1,380 s toward < 300 s).

Builds a clustered 768d corpus at --n with one (wave, W, beam_steps)
config per run, reports build seconds + rows/s + recall@10 of the built
graph at a small ef sweep, so speedups that damage graph quality are
caught immediately. W is plumbed through VETTORE_BUILD_W (read at module
import), so each config runs in its own process:

    python _exp/build_sweep.py --n 250000 --wave 8192            # baseline
    VETTORE_BUILD_W=8  python _exp/build_sweep.py --n 250000 --wave 8192
    VETTORE_BUILD_W=16 python _exp/build_sweep.py --n 250000 --wave 16384
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=250_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--wave", type=int, default=0)
    p.add_argument("--beam-steps", type=int, default=0)
    p.add_argument("--queries", type=int, default=512)
    p.add_argument("--algo", default="wave", choices=("wave", "knn"))
    p.add_argument("--rebuild", action="store_true")
    p.add_argument("--debug-waves", action="store_true")
    args = p.parse_args()

    if args.debug_waves:
        os.environ["VETTORE_BUILD_DEBUG"] = "1"

    from vettore_tpu.index import hnsw_build
    from vettore_tpu.index.hnsw_build import bulk_build
    from vettore_tpu.ops.transport import fetch_barrier

    from vettore_tpu import synth

    w = hnsw_build.BUILD_EXPAND_W
    # device-generated corpus (synth.clustered, bench geometry): no 95 s
    # host->device upload inside the timed region
    x_dev = synth.clustered(args.n, args.d, max(1024, args.n // 100), 0.4, 0)
    fetch_barrier(x_dev)
    ids = [f"doc-{i:07d}" for i in range(args.n)]
    params = {"m": 16, "m0": 32, "ef_construction": 100, "max_level": 12,
              "build": args.algo}

    # warm the session + compile caches on a tiny slice so the timed build
    # measures waves, not the tunnel's first-dispatch tax
    t0 = time.time()
    g0 = bulk_build("cosine", params, ids[:2048], x_device=x_dev[:2048],
                    wave=args.wave or None,
                    beam_steps=args.beam_steps or None)
    fetch_barrier(g0.a0)
    print(f"[sweep] session+tiny warm {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    g = bulk_build("cosine", params, ids, x_device=x_dev,
                   wave=args.wave or None,
                   beam_steps=args.beam_steps or None)
    fetch_barrier(g.a0)
    build_s = time.time() - t0
    print(f"[sweep] n={args.n} algo={args.algo} wave={args.wave or 'auto'} "
          f"W={w} beam_steps={args.beam_steps or 'auto'}: {build_s:.1f}s "
          f"({args.n / build_s:.0f} rows/s)", flush=True)
    if args.rebuild:
        # second build in-process: jit caches warm, so this isolates the
        # actual device work from one-time compiles
        t0 = time.time()
        g = bulk_build("cosine", params, ids, x_device=x_dev,
                       wave=args.wave or None,
                       beam_steps=args.beam_steps or None)
        fetch_barrier(g.a0)
        warm_s = time.time() - t0
        print(f"[sweep] warm rebuild: {warm_s:.1f}s "
              f"({args.n / warm_s:.0f} rows/s)", flush=True)

    q = np.asarray(synth.perturbed_queries(x_dev, args.queries, 0.4, 7))

    import jax
    import jax.numpy as jnp

    @jax.jit
    def exact10(qs, x):
        # x as an ARGUMENT: a closed-over block ships as a compile-request
        # constant and blows the tunnel's request size limit (HTTP 413)
        s = jnp.dot(qs, x.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, 10)[1]

    gt = np.asarray(jax.device_get(exact10(jnp.asarray(q), g.x)))

    from vettore_tpu.index import hnsw_device

    hub_slots, hub_x = g.hubs(jnp.bfloat16)
    for ef in (16, 32, 64):
        ids, _raws, _d = jax.device_get(hnsw_device._search_kernel(
            g.x, g.a0, g.up_index, g.up_adj, g.lex_rank, g.entry_slot,
            g.entry_level, jnp.asarray(q), metric="cosine", lmax=g.lmax,
            ef=ef, limit=10, max_steps=hnsw_device.step_bound(ef),
            xb=g.xb, hub_slots=hub_slots, hub_x=hub_x,
        ))
        rec = np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
            for i in range(len(q))
        ])
        print(f"[sweep]   ef={ef}: recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
