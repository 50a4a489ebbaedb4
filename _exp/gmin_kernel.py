"""Prototype: Pallas fused matmul+group-min flat scan (pass 1) + candidate
rescore variants (pass 3). Parity-checked against ops/flat_scan, then timed
at 1M x 768 cosine, batch 512, f32 + bf16.

Variants:
  A: pass3 = XLA row gather x[cand_slots] + einsum
  B: pass3 = Pallas scalar-prefetch per-(query, group) rescore
Selection = lax.top_k(k+pad) by rank + small (rank, lex) sort + tie flag.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = int(os.environ.get("EXP_GROUP", "64"))
GROUP_SLACK = 8
TIE_PAD = 16
_BIG32 = 2**31 - 1


def _gmin_body(x_ref, xsq_ref, bias_ref, qt_ref, qsq_ref, gmin_ref, flag_ref,
               *, metric, fast):
    dots = jnp.dot(
        x_ref[:], qt_ref[:],
        preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )  # [T, B]
    if metric in ("cosine", "inner_product", "negative_inner_product"):
        rank = -dots
    else:
        rank = xsq_ref[:] - 2.0 * dots + qsq_ref[:]
    nonfinite = jnp.logical_not(jnp.isfinite(rank))
    valid = bias_ref[:] == 0.0
    flag_ref[0, 0, :] = jnp.broadcast_to(
        jnp.any(nonfinite & valid).astype(jnp.int32), flag_ref.shape[2:])
    rank = rank + bias_ref[:]
    rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)
    t, b = rank.shape
    gmin_ref[:] = jnp.min(rank.reshape(t // GROUP, GROUP, b), axis=1)


@functools.partial(jax.jit, static_argnames=("metric", "row_tile"))
def gmin_scan(x, xsq, bias, q, *, metric, row_tile):
    n, d = x.shape
    b = q.shape[0]
    fast = x.dtype == jnp.bfloat16
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)[None, :]  # [1, B]
    qt = (q.astype(jnp.bfloat16) if fast else q).T  # [d, B]: one transpose
    tiles = n // row_tile
    kernel = functools.partial(_gmin_body, metric=metric, fast=fast)
    gmin, flags = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((d, b), lambda i: (0, 0)),
            pl.BlockSpec((1, b), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((row_tile // GROUP, b), lambda i: (i, 0)),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, b), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=n * d * x.dtype.itemsize + b * d * 4 + n // GROUP * b * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, xsq.reshape(-1, 1), bias.reshape(-1, 1), qt, qsq)
    return gmin.T, jnp.sum(flags) == 0  # [B, NG], scalar ok


def _rescore_body(gidx_ref, x_ref, xsq_ref, bias_ref, q_ref, out_ref,
                  *, metric, fast):
    b = pl.program_id(0)
    qm = q_ref[pl.ds(b, 1), :]  # [1, d]
    # mul-reduce matvec: Mosaic's dot_general matvec path miscompiles mixed
    # dtypes; 64 x d MACs per step are VPU noise anyway
    dots = jnp.sum(
        x_ref[:].astype(jnp.float32) * qm.astype(jnp.float32),
        axis=1, keepdims=True)  # [GROUP, 1]
    if metric in ("cosine", "inner_product", "negative_inner_product"):
        rank = dots * -1.0
    else:
        qsq = jnp.sum(qm.astype(jnp.float32) ** 2)
        rank = xsq_ref[:] - 2.0 * dots + qsq
    rank = rank + bias_ref[:]
    rank = jnp.where(jnp.isfinite(rank), rank, jnp.inf)
    g = pl.program_id(1)
    out_ref[0, pl.ds(g, 1), :] = rank.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("metric",))
def rescore_pallas(x, xsq, bias, q, gidx, *, metric):
    b, gsel = gidx.shape
    d = x.shape[1]
    fast = x.dtype == jnp.bfloat16
    # q stays f32: dynamic bf16 sublane indexing needs a multiple-of-16 proof
    # Mosaic can't make, and the mul-reduce accumulates in f32 anyway
    qd = q
    kernel = functools.partial(_rescore_body, metric=metric, fast=fast)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, gsel),
        in_specs=[
            pl.BlockSpec((GROUP, d), lambda i, g, gidx: (gidx[i, g], 0)),
            pl.BlockSpec((GROUP, 1), lambda i, g, gidx: (gidx[i, g], 0)),
            pl.BlockSpec((GROUP, 1), lambda i, g, gidx: (gidx[i, g], 0)),
            pl.BlockSpec((b, d), lambda i, g, gidx: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, gsel, GROUP), lambda i, g, gidx: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, gsel, GROUP), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(gidx, x, xsq.reshape(-1, 1), bias.reshape(-1, 1), qd)


@functools.partial(jax.jit, static_argnames=("metric", "k", "row_tile", "variant"))
def fused2(x, xsq, bias, lex_rank, q, *, metric, k, row_tile, variant):
    n, d = x.shape
    b = q.shape[0]
    ng = n // GROUP
    gmin, fin = gmin_scan(x, xsq, bias, q, metric=metric, row_tile=row_tile)
    gsel = min(k + GROUP_SLACK, ng)
    neg_gtop, gidx = jax.lax.top_k(-gmin, gsel)
    if gsel < ng and gsel >= k:
        mk = -neg_gtop[:, k - 1]
        spill_ok = jnp.all(
            jnp.sum((gmin <= mk[:, None]).astype(jnp.int32), axis=1) <= gsel)
    else:
        spill_ok = jnp.bool_(True)

    cand_slots = (
        gidx[:, :, None] * GROUP + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    ).reshape(b, gsel * GROUP)
    if variant == "A":
        rows = x[cand_slots]
        dots = jnp.einsum(
            "bcd,bd->bc", rows.astype(x.dtype), q.astype(x.dtype),
            preferred_element_type=jnp.float32,
            precision=None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        )
        if metric in ("cosine", "inner_product", "negative_inner_product"):
            cand = -dots
        else:
            qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            cand = xsq[cand_slots] - 2.0 * dots + qsq
        cand = cand + bias[cand_slots]
        cand = jnp.where(jnp.isfinite(cand), cand, jnp.inf)
    else:
        cand = rescore_pallas(x, xsq, bias, q, gidx, metric=metric).reshape(
            b, gsel * GROUP)

    # selection: top_k(k + TIE_PAD) by rank, lex-sort the small set, flag a
    # rank tie that straddles the pad boundary (=> lex order not provable)
    sel = min(k + TIE_PAD, gsel * GROUP)
    neg_sel, pos = jax.lax.top_k(-cand, sel)
    sel_rank = -neg_sel
    sel_slots = jnp.take_along_axis(cand_slots, pos, axis=1)
    sel_lex = jnp.where(jnp.isfinite(sel_rank), lex_rank[sel_slots], _BIG32)
    rank_s, _, slot_s = jax.lax.sort(
        (sel_rank, sel_lex, sel_slots), num_keys=2, dimension=1)
    tie_ok = jnp.all(
        jnp.logical_or(rank_s[:, k - 1] < sel_rank[:, sel - 1],
                       jnp.logical_not(jnp.isfinite(sel_rank[:, sel - 1]))))
    top_rank = rank_s[:, :k]
    top_slot = slot_s[:, :k]

    if metric in ("l2", "l2_squared"):
        rows = x[top_slot].astype(jnp.float32)
        diff = rows - q.astype(jnp.float32)[:, None, :]
        sq = jnp.sum(diff * diff, axis=-1)
        raw = jnp.sqrt(sq) if metric == "l2" else sq
        top_rank = jnp.where(jnp.isfinite(top_rank), raw, jnp.inf)
    else:
        rows = x[top_slot].astype(jnp.float32)
        rdots = jnp.einsum(
            "bkd,bd->bk", rows, q.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        raw = -rdots if metric == "negative_inner_product" else rdots
        if metric == "cosine":
            top_rank = 1.0 + top_rank
    return top_slot, raw, top_rank, fin & spill_ok & tie_ok


def main():
    from bench import cached_corpus, make_queries
    from vettore_tpu.ops.flat_scan import fused_flat_search
    from vettore_tpu.ops.transport import fetch_barrier, put_f32_matrix

    N, D, B, K = 1_000_000, 768, 512, 10
    CAP = -(-N // 1024) * 1024  # row-tile multiple (matches flat.py sizing)
    data = cached_corpus(N, D)
    queries = make_queries(data, 2 * B)
    x32 = put_f32_matrix(data)
    fetch_barrier(x32)
    x32 = jnp.concatenate([x32, jnp.zeros((CAP - N, D), jnp.float32)])
    x16 = x32.astype(jnp.bfloat16)
    fetch_barrier(x16)
    xsq = jnp.sum(x32.astype(jnp.float32) ** 2, axis=1)
    bias = jnp.concatenate(
        [jnp.zeros(N, jnp.float32), jnp.full(CAP - N, jnp.inf, jnp.float32)])
    lex = jnp.arange(CAP, dtype=jnp.int32)
    qdev = jnp.asarray(queries.astype(np.float32))
    q0 = qdev[:B]

    # ---- parity vs the current XLA fused scan (f32 exact path)
    ref_slots, ref_raws, _r, ref_ok = jax.device_get(
        fused_flat_search(x32, xsq.reshape(-1, 1), bias.reshape(-1, 1), lex,
                          q0[:16], metric="cosine", k=K))
    for variant in ("A", "B"):
        s, r, _, ok = jax.device_get(
            fused2(x32, xsq, bias, lex, q0[:16], metric="cosine", k=K,
                   row_tile=512, variant=variant))
        assert bool(ok), variant
        assert np.array_equal(s, ref_slots), (variant, s[:2], ref_slots[:2])
        assert np.allclose(r, ref_raws, atol=1e-6), variant
        print(f"variant {variant}: parity ok", flush=True)

    # ---- timing: gmin pass alone, then full variant B
    for label, x in (("f32", x32), ("bf16", x16)):
        for rt in ((512,) if label == "f32" else (1024, 512)):
            def gdispatch(i, x=x, rt=rt):
                s = (i * 37) % (qdev.shape[0] - B)
                return gmin_scan(x, xsq, bias,
                                 jax.lax.dynamic_slice_in_dim(qdev, s, B),
                                 metric="cosine", row_tile=rt)[0]
            fetch_barrier(gdispatch(0))
            t0 = time.perf_counter()
            last = None
            for i in range(6):
                last = gdispatch(i)
            fetch_barrier(last)
            ms = (time.perf_counter() - t0) / 6 * 1000
            print(f"{label:5s} gmin T={rt:5d}: {ms:7.2f} ms/batch", flush=True)
    # stage increments: gmin+topk, then +rescore (bf16, best tile)
    @functools.partial(jax.jit, static_argnames=("stage",))
    def staged(x, q, *, stage):
        gmin, _fin = gmin_scan(x, xsq, bias, q, metric="cosine", row_tile=1024)
        gsel = K + GROUP_SLACK
        _v, gidx = jax.lax.top_k(-gmin, gsel)
        if stage == "topk":
            return gidx
        return rescore_pallas(x, xsq, bias, q, gidx, metric="cosine")

    for stage in ("topk", "rescore"):
        def sdispatch(i, stage=stage):
            s = (i * 37) % (qdev.shape[0] - B)
            return staged(x16, jax.lax.dynamic_slice_in_dim(qdev, s, B),
                          stage=stage)
        fetch_barrier(sdispatch(0))
        t0 = time.perf_counter()
        last = None
        for i in range(6):
            last = sdispatch(i)
        fetch_barrier(last)
        ms = (time.perf_counter() - t0) / 6 * 1000
        print(f"bf16  gmin+{stage:8s}: {ms:7.2f} ms/batch", flush=True)

    for label, x in (("f32", x32), ("bf16", x16)):
        for variant in ("B", "A"):
            if variant == "A" and os.environ.get("EXP_SKIP_A"):
                continue
            for rt in ((512,) if label == "f32" else (1024, 512)):
                def dispatch(i):
                    s = (i * 37) % (qdev.shape[0] - B)
                    return fused2(x, xsq, bias, lex,
                                  jax.lax.dynamic_slice_in_dim(qdev, s, B),
                                  metric="cosine", k=K, row_tile=rt,
                                  variant=variant)[0]
                fetch_barrier(dispatch(0))
                t0 = time.perf_counter()
                last = None
                for i in range(6):
                    last = dispatch(i)
                fetch_barrier(last)
                ms = (time.perf_counter() - t0) / 6 * 1000
                print(f"{label:5s} {variant} T={rt:5d}: {ms:7.2f} ms/batch "
                      f"({B / ms * 1000:8.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
