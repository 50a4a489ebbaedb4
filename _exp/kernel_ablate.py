"""Ablation: which component of the beam step dominates? Runs a hacked copy
of the layer-0 beam with parts disabled (correctness ignored for disabled
parts — timing only)."""
import sys, os, time, functools
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp


def make_kernel(*, dedup, visited_on, merge, score, W, ef, max_steps, metric="cosine"):
    @functools.partial(jax.jit, static_argnames=())
    def kern(x, xt, a0, lex_rank, entry_slot, queries):
        n = x.shape[0]
        m0 = a0.shape[1]
        words = (n + 31) // 32

        def one(q):
            qt = q.astype(xt.dtype)
            g = entry_slot
            beam_d = jnp.full(ef, jnp.inf, jnp.float32)
            beam_id = jnp.full(ef, -1, jnp.int32)
            beam_exp = jnp.zeros(ef, bool)
            visited = jnp.zeros(words, jnp.uint32)
            d0 = 1.0 - jnp.dot(xt[g].astype(jnp.float32), q)
            beam_d = beam_d.at[0].set(d0)
            beam_id = beam_id.at[0].set(g)
            visited = visited.at[g >> 5].set(jnp.uint32(1) << jnp.uint32(g & 31))

            def cond(s):
                return jnp.logical_and(s[4] < max_steps, jnp.logical_not(s[5]))

            def body(s):
                beam_d, beam_id, beam_exp, visited, step, _ = s
                unexp = jnp.where((~beam_exp) & (beam_id >= 0), beam_d, jnp.inf)
                neg_top, jpos = jax.lax.top_k(-unexp, W)
                top_d = -neg_top
                worst = jnp.max(beam_d)
                done = jnp.isinf(top_d[0]) | (top_d[0] > worst)
                expand_ok = jnp.isfinite(top_d) & ~done
                nodes = jnp.where(expand_ok, beam_id[jpos], -1)
                nbrs = a0[jnp.maximum(nodes, 0)].reshape(-1)
                valid = (nbrs >= 0) & jnp.repeat(expand_ok, m0)
                E = nbrs.shape[0]
                if dedup:
                    key = jnp.where(valid, nbrs, -1)
                    iota = jax.lax.iota(jnp.int32, E)
                    dup = jnp.any((key[None, :] == key[:, None]) &
                                  (iota[None, :] < iota[:, None]), axis=1)
                    valid = valid & ~dup
                safe = jnp.maximum(nbrs, 0)
                if visited_on:
                    word = safe >> 5
                    bit = jnp.uint32(1) << jnp.uint32(safe & 31)
                    seen = (visited[word] & bit) != 0
                    fresh = valid & ~seen
                    visited = visited.at[word].add(jnp.where(fresh, bit, jnp.uint32(0)))
                else:
                    fresh = valid
                if score:
                    dots = jnp.einsum("kd,d->k", xt[safe], qt,
                                      preferred_element_type=jnp.float32)
                    nd = jnp.where(fresh, 1.0 - dots, jnp.inf)
                else:
                    nd = jnp.where(fresh, safe.astype(jnp.float32) * 1e-6, jnp.inf)
                cat_d = jnp.concatenate([beam_d, nd])
                cat_id = jnp.concatenate([beam_id, jnp.where(fresh, nbrs, -1)])
                new_exp = beam_exp.at[jpos].set(beam_exp[jpos] | expand_ok)
                cat_exp = jnp.concatenate([new_exp, jnp.zeros(E, bool)])
                if merge == "topk":
                    neg_best, keep = jax.lax.top_k(-cat_d, ef)
                    return (-neg_best, cat_id[keep], cat_exp[keep], visited,
                            step + 1, done)
                elif merge == "sort":
                    cat_d, cat_id, cat_exp = jax.lax.sort(
                        (cat_d, cat_id, cat_exp), num_keys=1)
                    return (cat_d[:ef], cat_id[:ef], cat_exp[:ef], visited,
                            step + 1, done)
                else:  # none: keep old beam, just mark expanded (timing only)
                    return (beam_d, beam_id, new_exp, visited, step + 1, done)

            beam_d, beam_id, *_ = jax.lax.while_loop(
                cond, body, (beam_d, beam_id, beam_exp, visited, 0, False))
            return beam_id[:10], beam_d[:10]

        return jax.vmap(one)(queries)

    return kern


def main():
    z = np.load("/tmp/graph300k.npz")
    x = jnp.asarray(z["x"])
    xt = x.astype(jnp.bfloat16)
    a0 = jnp.asarray(z["a0"])
    lex = jnp.asarray(z["lex_rank"])
    es = jnp.int32(int(z["entry_slot"]))
    q = z["queries"]
    chunk = 128

    variants = [
        ("full", dict(dedup=True, visited_on=True, merge="topk", score=True)),
        ("no-dedup", dict(dedup=False, visited_on=True, merge="topk", score=True)),
        ("no-visited", dict(dedup=True, visited_on=False, merge="topk", score=True)),
        ("merge-sort1k", dict(dedup=True, visited_on=True, merge="sort", score=True)),
        ("no-merge", dict(dedup=True, visited_on=True, merge="none", score=True)),
        ("no-score", dict(dedup=True, visited_on=True, merge="topk", score=False)),
        ("fixed16steps", dict(dedup=True, visited_on=True, merge="topk", score=True)),
    ]
    for name, cfg in variants:
        ms = 16 if name == "fixed16steps" else 40
        kern = make_kernel(W=8, ef=64, max_steps=ms, **cfg)
        chunks = [jnp.asarray(q[s:s+chunk]) for s in range(0, 1024, chunk)]
        jax.device_get(kern(x, xt, a0, lex, es, chunks[0])[0])
        reps = 4
        t0 = time.time()
        last = None
        for r in range(reps):
            for c in chunks:
                last = kern(x, xt, a0, lex, es, c)
        jax.device_get(last[0])
        dt = time.time() - t0
        print(f"{name:14s}: {1024*reps/dt:7.0f} qps", flush=True)


if __name__ == "__main__":
    main()
