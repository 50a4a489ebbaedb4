"""Component costs of the pair-cover hamming selection at 1M."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vettore_tpu.ops.select import exact_top_c_unique_int, group_topk
from vettore_tpu.ops.transport import fetch_barrier

B, COUNT = 512, 500
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    fetch_barrier(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fetch_barrier(out)
    phase(f"{name}: {(time.perf_counter() - t0) / iters * 1000:7.2f} ms")


def main():
    key = jax.random.PRNGKey(0)
    for width in (32000, 64000):
        comp = jax.random.randint(key, (B, width), 0, 2**30, jnp.int32)
        bench(f"exact_top_c_unique_int [B,{width}] c=500",
              functools.partial(exact_top_c_unique_int, c=COUNT), comp)
    for ng in (7816, 15632):
        gmin = jax.random.randint(key, (B, ng), 0, 2**30, jnp.int32)
        bench(f"pair/group composite select [B,{ng}]",
              functools.partial(exact_top_c_unique_int, c=COUNT), gmin)
    gm = jax.random.uniform(key, (B, 7816), jnp.float32)
    bench("group_topk float [B,7816] gsel=508",
          functools.partial(group_topk, gsel=508, check_c=COUNT), gm)


if __name__ == "__main__":
    main()
