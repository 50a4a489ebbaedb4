"""Microbenchmarks on the real chip: bandwidth, matmul precision roofline,
top-k strategies at bench shapes. Guides the round-3 kernel redesign."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
import jax, jax.numpy as jnp
import functools

def force(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0])

def timed(name, fn, iters=4):
    t0 = time.time(); force(fn()); compile_s = time.time() - t0
    t0 = time.time()
    last = None
    for _ in range(iters):
        last = fn()
    force(last)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms (compile {compile_s:.1f}s)", flush=True)
    return dt

print(jax.devices(), flush=True)

# --- host->device bandwidth
big = np.ones((256 * 1024 * 1024 // 4,), np.float32)  # 1 GiB
t0 = time.time(); d = jax.device_put(big); d.block_until_ready()
# block_until_ready may not block on this runtime; force a fetch of a slice
force(d[:8])
dt = time.time() - t0
print(f"h2d 1GiB: {dt:.2f}s = {1.0/dt:.2f} GiB/s", flush=True)
del d, big

N, D, B = 1_000_000, 768, 512
x = jax.device_put(np.random.default_rng(0).normal(size=(N, D)).astype(np.float32))
q = jax.device_put(np.random.default_rng(1).normal(size=(B, D)).astype(np.float32))
xb = x.astype(jnp.bfloat16)
qb = q.astype(jnp.bfloat16)
force(xb); force(qb)

@functools.partial(jax.jit, static_argnames=("prec",))
def mm(x, q, prec):
    return jnp.dot(q, x.T, precision=prec, preferred_element_type=jnp.float32)

for prec, xx, qq in (("highest-f32", x, q), ("default-f32", x, q), ("bf16", xb, qb)):
    p = jax.lax.Precision.HIGHEST if prec == "highest-f32" else None
    dt = timed(f"matmul[{B},{D}]x[{D},{N}] {prec}",
               lambda xx=xx, qq=qq, p=p: mm(xx, qq, p), iters=2)
    print(f"  -> {2*N*D*B/dt/1e12:.1f} TFLOP/s", flush=True)

scores = mm(x, q, None)  # [B, N]
force(scores)

@functools.partial(jax.jit, static_argnames=("k",))
def topk(s, k):
    return jax.lax.top_k(s, k)

for k in (16, 128, 500):
    try:
        timed(f"lax.top_k[{B},{N}] k={k}", lambda k=k: topk(scores, k), iters=2)
    except Exception as e:
        print(f"top_k k={k} failed: {e}", flush=True)

@functools.partial(jax.jit, static_argnames=("k",))
def amaxk(s, k):
    return jax.lax.approx_max_k(s, k, recall_target=0.99)

try:
    timed(f"approx_max_k[{B},{N}] k=128", lambda: amaxk(scores, 128), iters=2)
except Exception as e:
    print("approx_max_k failed:", e, flush=True)

# group-min scheme in pure XLA: scores [B, N] -> [B, N/64] group mins -> topk
G = 64
@jax.jit
def group_min(s):
    return s.reshape(B, N // G, G).max(axis=2)  # max: higher=better for dot

gm = group_min(scores); force(gm)
timed(f"group_min[{B},{N}]->[B,{N//G}]", lambda: group_min(scores), iters=2)
timed(f"top_k[{B},{N//G}] k=24", lambda: topk(gm, 24), iters=2)

@jax.jit
def gather_groups(s, gi):
    # gi [B, 24] group ids -> gather [B, 24, G] scores
    return jnp.take_along_axis(s.reshape(B, N // G, G), gi[:, :, None], axis=1)

_, gi = topk(gm, 24)
force(gi)
timed("gather 24 groups of 64", lambda: gather_groups(scores, gi), iters=2)

@functools.partial(jax.jit, static_argnames=("nk",))
def sort2(r, l, nk):
    return jax.lax.sort((r, l), num_keys=nk)

cand = gather_groups(scores, gi).reshape(B, 24 * G)
lex = jnp.broadcast_to(jnp.arange(24 * G, dtype=jnp.int32)[None, :], cand.shape)
force(cand)
timed("sort [512,1536] 2keys", lambda: sort2(cand, lex, 2), iters=2)

# full fused: matmul + group min + topk + gather + sort, one jit
@jax.jit
def fused_xla_scan(x, q):
    s = jnp.dot(q, x.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    g = s.reshape(B, N // G, G).max(axis=2)
    _, gi = jax.lax.top_k(g, 24)
    c = jnp.take_along_axis(s.reshape(B, N // G, G), gi[:, :, None], axis=1)
    c = c.reshape(B, 24 * G)
    li = (gi[:, :, None] * G + jnp.arange(G, dtype=jnp.int32)[None, None, :]).reshape(B, 24 * G)
    nc, li_s = jax.lax.sort((-c, li), num_keys=2)
    return -nc[:, :16], li_s[:, :16]

dt = timed("FUSED xla scan f32-highest (matmul+gmin+topk+gather+sort)",
           lambda: fused_xla_scan(x, q), iters=3)
print(f"  -> {B/dt:.0f} QPS", flush=True)

@jax.jit
def fused_xla_scan_bf16(x, q):
    s = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
    g = s.reshape(B, N // G, G).max(axis=2)
    _, gi = jax.lax.top_k(g, 24)
    c = jnp.take_along_axis(s.reshape(B, N // G, G), gi[:, :, None], axis=1)
    c = c.reshape(B, 24 * G)
    li = (gi[:, :, None] * G + jnp.arange(G, dtype=jnp.int32)[None, None, :]).reshape(B, 24 * G)
    nc, li_s = jax.lax.sort((-c, li), num_keys=2)
    return -nc[:, :16], li_s[:, :16]

dt = timed("FUSED xla scan bf16", lambda: fused_xla_scan_bf16(xb, qb), iters=3)
print(f"  -> {B/dt:.0f} QPS", flush=True)

# Hamming stage shapes: bits [N, 48] u32 (768 bits = 24 u64 = 48 u32)
W = 24
bits = jax.device_put(np.random.default_rng(2).integers(0, 2**32, size=(N, W), dtype=np.uint32))
qbits = jax.device_put(np.random.default_rng(3).integers(0, 2**32, size=(B, W), dtype=np.uint32))

@jax.jit
def hamming_full(bits, qbits):
    # [B, N] popcount via XLA
    x = bits[None, :, :] ^ qbits[:, None, :]
    return jax.lax.population_count(x).sum(axis=-1).astype(jnp.int32)

try:
    dt = timed(f"hamming XLA [B,N,W] full", lambda: hamming_full(bits, qbits), iters=1)
    print(f"  -> {B/dt:.0f} QPS hamming-only", flush=True)
except Exception as e:
    print("hamming full failed:", e, flush=True)
print("done", flush=True)
