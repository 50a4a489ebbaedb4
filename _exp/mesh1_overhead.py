"""Mesh-of-1 shard_map overhead on the real chip (VERDICT r4 item 6).

The ICI merge cost model (parallel/cost.py) predicts the collective bytes of
the sharded search; what it lacks is a measured constant for the program
AROUND the collectives. One real chip can't measure ICI, but it can measure
the other two terms exactly, by timing three programs over the same resident
250k x 768 block and query stream:

  a) the single-chip serving path (FlatIndex.search_batch_device — the
     fused Pallas scan the bench times);
  b) the mesh code path's program body under plain jit (vmapped
     _local_topk: einsum + multi-key sort — the portable XLA formulation
     that runs inside the shard body);
  c) the same body under jax.shard_map on a (data=1, shard=1) mesh
     (parallel/mesh.sharded_search verbatim).

(c - b) is the shard_map dispatch/partitioning overhead per batch;
(b - a) is the XLA-formulation vs fused-Pallas kernel gap (the known
single-chip-proven follow-up, parallel/ivf_mesh.py:13-16). Writes
docs/mesh1_overhead.json; bench.py surfaces it in the record.
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
from vettore_tpu.index.flat import FlatIndex
from vettore_tpu.ops.transport import fetch_barrier, get_f32_matrix
from vettore_tpu.parallel.mesh import _local_topk, make_mesh, sharded_search

N, D, B, K = 262_144, 768, 512, 10
SEED = 20_260_721
T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def timed(dispatch, iters=24):
    fetch_barrier(dispatch(0))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = dispatch(i)
    fetch_barrier(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms/batch


def main():
    phase(f"corpus {N}x{D} on device")
    x_dev = synth.clustered(N, D, max(1024, N // 100), 0.4, SEED)
    fetch_barrier(x_dev)
    host = get_f32_matrix(x_dev)
    ids = [f"doc-{i:07d}" for i in range(N)]
    qdev = synth.perturbed_queries(x_dev, 2 * B, 0.4, SEED + 1)
    qslices = [jax.lax.dynamic_slice_in_dim(qdev, (i * 37) % B, B)
               for i in range(8)]
    fetch_barrier(qslices[-1])

    # ---- (a) single-chip serving path (fused Pallas scan)
    phase("a) flat ingest + adopt")
    flat = FlatIndex("cosine")
    flat.put_matrix(ids, host)
    flat.adopt_device_block(x_dev)
    a_ms = timed(lambda i: flat.search_batch_device(
        qslices[i % len(qslices)], K)[0])
    phase(f"a) fused single-chip path: {a_ms:.2f} ms/batch")

    # ---- shared arrays for (b) and (c), in the mesh layout
    mesh = make_mesh(jax.devices()[:1])
    lex = np.zeros(N, np.int32)
    lex[np.argsort(np.array(ids, dtype=str), kind="stable")] = np.arange(
        N, dtype=np.int32)
    valid = jnp.ones(N, bool)
    lex_d = jnp.asarray(lex)

    # ---- (b) the shard-body program under plain jit, same device layout.
    # The block rides as an ARGUMENT: a closed-over device array ships as a
    # compile-request constant and blows the tunnel's size limit (HTTP 413)
    @jax.jit
    def plain(x, v, lx, q):
        def one(qrow):
            r, l, s, rw = _local_topk(x, v, lx, qrow, metric="cosine", k=K)
            return s, rw
        return jax.vmap(one)(q)

    b_ms = timed(lambda i: plain(x_dev, valid, lex_d,
                                 qslices[i % len(qslices)])[0])
    phase(f"b) XLA formulation, plain jit: {b_ms:.2f} ms/batch")

    # ---- (c) the same program under shard_map on the 1-device mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x_dev, NamedSharding(mesh, P("shard", None)))
    vs = jax.device_put(valid, NamedSharding(mesh, P("shard")))
    ls = jax.device_put(lex_d, NamedSharding(mesh, P("shard")))
    qs = [jax.device_put(q, NamedSharding(mesh, P("data", None)))
          for q in qslices]
    c_ms = timed(lambda i: sharded_search(
        mesh, xs, vs, ls, qs[i % len(qs)], metric="cosine", k=K)[0])
    phase(f"c) shard_map mesh-of-1: {c_ms:.2f} ms/batch")

    result = {
        "scale": f"{N}x{D}", "batch": B, "limit": K, "metric": "cosine",
        "fused_single_chip_ms": round(a_ms, 2),
        "xla_body_plain_jit_ms": round(b_ms, 2),
        "shard_map_mesh1_ms": round(c_ms, 2),
        "shard_map_dispatch_overhead_ms": round(c_ms - b_ms, 2),
        "xla_vs_fused_kernel_gap_ms": round(b_ms - a_ms, 2),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "mesh1_overhead.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    phase(f"wrote {path}: {result}")


if __name__ == "__main__":
    main()
