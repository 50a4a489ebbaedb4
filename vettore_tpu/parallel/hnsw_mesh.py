"""Mesh-sharded HNSW: one sub-graph per chip, scatter-gather search over ICI.

Collections past one chip's HBM shard by rows: each shard builds an
independent HNSW graph over its rows (device wave construction), and a query
searches every shard's graph in parallel under ``shard_map``, then the
per-shard top-k candidate sets (rank, lex-rank, global row) merge over ICI
with a multi-key sort — identical ordering semantics to single-chip search.

Searching S smaller graphs with the same ef does not lose recall relative to
one big graph (each shard's exact neighbors are a superset of the global
top-k restricted to that shard); the merge is exact over the candidates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index import hnsw_build, hnsw_device
from ..index.hnsw import validate_options
from ..metrics import normalize_metric


class ShardedHnsw:
    """HNSW index sharded across the ``shard`` axis of a device mesh."""

    def __init__(self, metric: str, mesh: Mesh, ids, vectors, *, options=None):
        metric = normalize_metric(metric)
        self.metric = metric
        self.params = validate_options(options)
        self.mesh = mesh
        shards = mesh.shape["shard"]
        vectors = np.asarray(vectors, dtype=np.float32)
        n, d = vectors.shape
        if len(ids) != n:
            raise ValueError("ids/vectors length mismatch")
        per = math.ceil(n / shards)

        # global lex ranks for the deterministic merge tie-break
        order = np.argsort(np.array([str(i) for i in ids], dtype=str), kind="stable")
        global_lex = np.zeros(n, dtype=np.int32)
        global_lex[order] = np.arange(n, dtype=np.int32)

        graphs = []
        row_of = []  # per shard: local slot -> global row
        for s in range(shards):
            lo, hi = s * per, min((s + 1) * per, n)
            shard_ids = [str(ids[i]) for i in range(lo, hi)]
            if not shard_ids:
                shard_ids, shard_vecs = ["__pad__"], np.zeros((1, d), np.float32)
            else:
                shard_vecs = vectors[lo:hi]
            graph = hnsw_build.bulk_build(self.metric, self.params, shard_ids, shard_vecs)
            graphs.append(graph)
            id_to_row = {str(ids[i]): i for i in range(lo, hi)}
            row_of.append(np.array(
                [id_to_row.get(gid, -1) for gid in graph.ids], dtype=np.int32
            ))

        # pad all shard graphs to common static shapes and stack on axis 0
        cap = max(g.n for g in graphs)
        cap_up = max(max(np.asarray(g.up_adj).shape[0], 1) for g in graphs)
        lmax = max(g.lmax for g in graphs)
        m = self.params["m"]
        m0 = self.params["m0"]
        xs = np.zeros((shards, cap, d), np.float32)
        a0s = np.full((shards, cap, m0), -1, np.int32)
        upis = np.full((shards, cap), -1, np.int32)
        upas = np.full((shards, cap_up, max(lmax, 1), m), -1, np.int32)
        lexs = np.full((shards, cap), 2**30, np.int32)
        rows = np.full((shards, cap), -1, np.int32)
        entries = np.zeros((shards, 2), np.int32)
        for s, g in enumerate(graphs):
            xs[s, : g.n] = np.asarray(g.x)
            a0s[s, : g.n] = np.asarray(g.a0)
            upis[s, : g.n] = np.asarray(g.up_index)
            ua = np.asarray(g.up_adj)
            upas[s, : ua.shape[0], : ua.shape[1]] = ua
            # per-shard lex must use GLOBAL lex ranks so the merge tie-break
            # is identical to a single-chip index
            valid_rows = row_of[s]
            shard_lex = np.where(valid_rows >= 0, global_lex[np.maximum(valid_rows, 0)], 2**30)
            lexs[s, : g.n] = shard_lex
            rows[s, : g.n] = valid_rows
            entries[s] = (int(g.entry_slot), int(g.entry_level))

        self.ids = [str(i) for i in ids]
        self.n = n
        self.d = d
        self.lmax = lmax
        shard_rows = NamedSharding(mesh, P("shard"))
        self._x = jax.device_put(xs, NamedSharding(mesh, P("shard", None, None)))
        self._a0 = jax.device_put(a0s, NamedSharding(mesh, P("shard", None, None)))
        self._upi = jax.device_put(upis, NamedSharding(mesh, P("shard", None)))
        self._upa = jax.device_put(upas, NamedSharding(mesh, P("shard", None, None, None)))
        self._lex = jax.device_put(lexs, NamedSharding(mesh, P("shard", None)))
        self._rows = jax.device_put(rows, NamedSharding(mesh, P("shard", None)))
        self._entries = jax.device_put(entries, shard_rows)

    def search_batch(self, queries, limit: int) -> list:
        """Returns ``[(id, raw)]`` per query, exact merge across shard graphs."""
        queries = np.asarray(queries, dtype=np.float32)
        b = queries.shape[0]
        dp = self.mesh.shape["data"]
        pad_b = max(dp, math.ceil(b / dp) * dp)
        padded = np.zeros((pad_b, self.d), np.float32)
        padded[:b] = queries
        q = jax.device_put(padded, NamedSharding(self.mesh, P("data", None)))
        ef = min(max(self.params["ef_search"], limit), max(self.n, 1))
        k = min(limit, max(self.n, 1))
        rows, raws = jax.device_get(
            _sharded_search(
                self.mesh, self._x, self._a0, self._upi, self._upa, self._lex,
                self._rows, self._entries, q,
                metric=self.metric, lmax=self.lmax, ef=ef, k=k,
            )
        )
        out = []
        for row in range(b):
            hits = []
            for gr, raw in zip(rows[row], raws[row]):
                if gr < 0:
                    continue
                hits.append((self.ids[int(gr)], float(raw)))
            out.append(hits[:limit])
        return out


def _sharded_search(mesh, x, a0, upi, upa, lex, rows, entries, queries, *,
                    metric, lmax, ef, k):
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("shard", None, None), P("shard", None, None), P("shard", None),
            P("shard", None, None, None), P("shard", None), P("shard", None),
            P("shard", None), P("data", None),
        ),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    def step(x_b, a0_b, upi_b, upa_b, lex_b, rows_b, entries_b, q_b):
        # local block has leading shard axis of size 1. Beams hub-seed from
        # the shard's top-by-level prefix (bulk slots are level-desc sorted;
        # trailing pad slots have no adjacency and fall out of the beam).
        cap = x_b.shape[1]
        h = min(hnsw_device.hub_count(cap), cap)
        slots, raws, dists = hnsw_device._search_impl(
            x_b[0], a0_b[0], upi_b[0], upa_b[0], lex_b[0],
            entries_b[0, 0], entries_b[0, 1], q_b,
            metric=metric, lmax=lmax, ef=ef, limit=k,
            max_steps=hnsw_device.step_bound(ef),
            hub_slots=jnp.arange(h, dtype=jnp.int32), hub_x=x_b[0][:h],
            # zero-vector pad rows score finitely; mask them out of seeding
            hub_valid=rows_b[0][:h] >= 0,
        )  # [b, k]
        # exclude pad nodes (row -1, e.g. the '__pad__' filler on empty
        # shards) BEFORE the merge — with finite distances they would
        # otherwise displace real candidates inside the top-k cut
        grows_raw = rows_b[0][jnp.maximum(slots, 0)]
        ok = (slots >= 0) & (grows_raw >= 0)
        grows = jnp.where(ok, grows_raw, -1)
        glex = jnp.where(ok, lex_b[0][jnp.maximum(slots, 0)], 2**31 - 1)
        dists = jnp.where(ok, dists, jnp.inf)
        # gather per-shard candidates over ICI and merge exactly
        d_all = jax.lax.all_gather(dists, "shard", axis=1, tiled=True)
        l_all = jax.lax.all_gather(glex, "shard", axis=1, tiled=True)
        r_all = jax.lax.all_gather(grows, "shard", axis=1, tiled=True)
        w_all = jax.lax.all_gather(raws, "shard", axis=1, tiled=True)
        dm, _, rm, wm = jax.lax.sort((d_all, l_all, r_all, w_all), num_keys=2,
                                     dimension=1)
        top_rows = jnp.where(jnp.isfinite(dm[:, :k]), rm[:, :k], -1)
        return top_rows, wm[:, :k]

    return step(x, a0, upi, upa, lex, rows, entries, queries)
