"""Steady-state HNSW wave cost per config (VERDICT r4 item 2).

Full-build sweeps pay minutes of per-config remote compiles for every
(n, W, beam_steps, lmax_wave-bucket) shape — too slow to explore. This
probe times ONLY the steady-state term: layer-0 waves (the last ~93% of a
(level desc, id)-ordered build), by pinning every node's level to 0 so a
single kernel variant compiles per config. Wave 0 carries the compile;
waves 2..K time the steady state. Extrapolation: 1M build ≈ n/wave x
steady wave_s + upper-level overhead (~8% of waves).

    VETTORE_BUILD_W=8 python _exp/wave_probe.py --n 262144 --wave 8192 \
        --beam-steps 48 --efc 100 --waves 6
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262_144)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--wave", type=int, default=8192)
    p.add_argument("--beam-steps", type=int, default=0)
    p.add_argument("--efc", type=int, default=100)
    p.add_argument("--waves", type=int, default=6)
    p.add_argument("--no-hubs", action="store_true")
    args = p.parse_args()

    from vettore_tpu import synth
    from vettore_tpu.index import hnsw_build
    from vettore_tpu.index.hnsw_device import hub_count
    from vettore_tpu.ops.transport import fetch_barrier

    w = hnsw_build.BUILD_EXPAND_W
    steps = args.beam_steps or hnsw_build.build_step_bound(args.efc)
    print(f"[wave] n={args.n} wave={args.wave} W={w} efc={args.efc} "
          f"steps={steps}", flush=True)

    x = synth.clustered(args.n, args.d, max(1024, args.n // 100), 0.4, 0)
    fetch_barrier(x)
    n, m, m0 = args.n, 16, 32
    xt = x.astype(jnp.bfloat16)
    a0 = jnp.full((n + 1, m0), -1, jnp.int32)
    up_adj = jnp.full((2, 1, m), -1, jnp.int32)
    up_index = jnp.full(n, -1, jnp.int32)
    lex = jnp.arange(n, dtype=jnp.int32)
    levels = jnp.zeros(n, jnp.int32)
    hub_cap = 0 if args.no_hubs else hub_count(n)

    for wi in range(args.waves):
        start = wi * args.wave
        slots = np.arange(start, start + args.wave, dtype=np.int32)
        mask = np.ones(args.wave, bool)
        t0 = time.perf_counter()
        a0, up_adj = hnsw_build._wave_step(
            x, xt, a0, up_adj, up_index, lex, levels,
            jnp.asarray(slots), jnp.asarray(mask), jnp.int32(start),
            jnp.int32(0), jnp.int32(0),
            metric="cosine", efc=args.efc, m=m, m0=m0, lmax=0, lmax_wave=0,
            beam_steps=steps, hub_cap=hub_cap)
        fetch_barrier(a0[start, 0])
        dt = time.perf_counter() - t0
        est_1m = dt * (1_000_000 / args.wave) * 1.08
        print(f"[wave] wave {wi}: {dt:.2f}s"
              + ("" if wi == 0 else f"  (1M est ~{est_1m:.0f}s)"), flush=True)


if __name__ == "__main__":
    main()
