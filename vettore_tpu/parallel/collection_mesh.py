"""Mesh-backed collection indexes: the full Collection lifecycle on a
multi-chip mesh.

SURVEY §5.8 mandates that collections larger than one chip shard across a
mesh. Round 1 shipped :class:`ShardedFlat` / :class:`ShardedHnsw` as
build-once artifacts; these adapters wrap them in the ``Vettore.Index``
behaviour (new/put/put_many/delete/search — lib/vettore/index.ex:12-17) so a
``Collection(..., mesh=...)`` gets sharded ingest, search, snapshot/restore
(the canonical host store stays the source of truth; device shards are
always rebuilt from it, README.md:14-16), and coarse mutation:

* ``MeshFlatIndex`` — host mirror (a :class:`FlatIndex`, which also provides
  the reference's batch-validation semantics) + a row-sharded device block.
  Deletes flip the device validity mask in place (one [cap]-bool transfer);
  inserts/replaces rebuild the shards lazily on the next search.
* ``MeshHnswIndex`` — host mirror + per-shard wave-built graphs. Inserts
  append to a pending tail that is scanned exactly and merged with the graph
  candidates by (rank, id); the graphs rebuild once the tail outgrows
  ``REBUILD_FRACTION`` of the built set. Deletes and overwrites mask their
  ids out of graph results until the next rebuild.
"""

from __future__ import annotations

import numpy as np

from ..errors import MetricOverflow, UnsupportedHnswMetric
from ..index.base import Index
from ..index.flat import FlatIndex
from ..index.hnsw import HNSW_METRICS, validate_options
from ..metrics import normalize_metric, rank_value
from .hnsw_mesh import ShardedHnsw
from .mesh import ShardedFlat


def _tail_scores(metric: str, rows: np.ndarray, queries: np.ndarray):
    """Batched f64 scores of the pending tail vs a query batch, rounded to
    f32 like the per-pair host oracle (scan_host.vector_top_k) so merge
    ordering is bit-stable against it. Returns (raw [B, T], rank [B, T])."""
    q = queries.astype(np.float64)
    v = rows.astype(np.float64)
    dots = q @ v.T
    if metric == "l2":
        qq = np.einsum("bd,bd->b", q, q)
        vv = np.einsum("td,td->t", v, v)
        raw = np.sqrt(np.maximum(qq[:, None] + vv[None, :] - 2.0 * dots, 0.0))
    elif metric == "cosine":
        nq = np.sqrt(np.einsum("bd,bd->b", q, q))
        nv = np.sqrt(np.einsum("td,td->t", v, v))
        denom = nq[:, None] * nv[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            raw = np.where(denom > 0.0, dots / np.maximum(denom, 1e-300), 0.0)
        raw = np.clip(raw, -1.0, 1.0)
    else:  # inner_product
        raw = dots
    raw = raw.astype(np.float32).astype(np.float64)
    if not np.isfinite(raw).all():
        raise MetricOverflow("f32 overflow in pending-tail scan")
    if metric == "l2":
        rank = raw
    elif metric == "cosine":
        rank = 1.0 - raw
    else:
        rank = -raw
    return raw, rank


class MeshFlatIndex(Index):
    """Flat exact index row-sharded over a device mesh."""

    def __init__(self, metric: str, options=None, *, mesh, storage: str = "f32"):
        self._host = FlatIndex(metric, options)
        self.metric = self._host.metric
        self.mesh = mesh
        self.storage = storage
        self._sharded: ShardedFlat | None = None
        self._built_version = -1
        self._version = 0
        self._mask_dirty: list[str] = []

    def __len__(self):
        return len(self._host)

    @property
    def dimension(self):
        return self._host.dimension

    def put(self, id: str, vector) -> None:
        self.put_many([(id, vector)])

    def put_many(self, pairs) -> None:
        self._host.put_many(pairs)
        self._version += 1
        self._mask_dirty = []  # structural change: full rebuild

    def delete(self, id: str) -> None:
        existed = id in self._host._slot_of
        self._host.delete(id)
        if not existed:
            return
        if self._sharded is not None and self._built_version == self._version:
            # cheap path: flip the validity bit on device, no reshard
            self._mask_dirty.append(id)
            self._version += 1
            self._built_version = self._version
        else:
            self._version += 1

    def _sync(self):
        if self._sharded is not None and self._built_version == self._version:
            if self._mask_dirty:
                self._sharded.invalidate_ids(self._mask_dirty)
                self._mask_dirty = []
            return
        host = self._host
        if host._host_x is None or not host._slot_of:
            self._sharded = None
            self._built_version = self._version
            return
        live = sorted(host._slot_of)
        rows = np.stack([host._host_x[host._slot_of[id]] for id in live])
        self._sharded = ShardedFlat(self.metric, self.mesh, live, rows,
                                    storage=self.storage)
        self._built_version = self._version
        self._mask_dirty = []

    def search(self, query, limit: int) -> list:
        return self.search_batch(np.asarray(query, np.float32)[None, :], limit)[0]

    def search_batch(self, queries, limit: int) -> list:
        if limit == 0:
            return [[] for _ in range(len(queries))]
        self._sync()
        if self._sharded is None:
            return [[] for _ in range(len(queries))]
        return self._sharded.search_batch(queries, limit)


class MeshHnswIndex(Index):
    """HNSW sharded over a device mesh: per-shard graphs + exact pending tail."""

    #: rebuild the shard graphs once the pending tail exceeds this fraction
    #: of the built set (or on the first search after construction)
    REBUILD_FRACTION = 0.2

    def __init__(self, metric: str, options=None, *, mesh):
        metric = normalize_metric(metric)
        if metric not in HNSW_METRICS:
            raise UnsupportedHnswMetric(metric)
        self.metric = metric
        self.params = validate_options(options)
        self.mesh = mesh
        self._host = FlatIndex(metric)  # mirror + validation
        self._sharded: ShardedHnsw | None = None
        self._built_ids: set[str] = set()
        self._stale: set[str] = set()  # built ids whose vector changed/deleted

    def __len__(self):
        return len(self._host)

    @property
    def dimension(self):
        return self._host.dimension

    def put(self, id: str, vector) -> None:
        self.put_many([(id, vector)])

    def put_many(self, pairs) -> None:
        pairs = [(str(id), v) for id, v in pairs]
        self._host.put_many(pairs)
        for id, _ in pairs:
            if id in self._built_ids:
                self._stale.add(id)

    def delete(self, id: str) -> None:
        self._host.delete(id)
        if id in self._built_ids:
            self._stale.add(id)

    def _live_ids(self) -> list:
        return sorted(self._host._slot_of)

    def _rows_for(self, ids) -> np.ndarray:
        host = self._host
        return np.stack([host._host_x[host._slot_of[id]] for id in ids])

    def _maybe_rebuild(self, live):
        usable = len(self._built_ids) - len(self._stale)
        pending = len(live) - usable
        if self._sharded is not None and pending <= max(
            64, int(self.REBUILD_FRACTION * max(usable, 1))
        ):
            return
        if not live:
            self._sharded = None
            self._built_ids = set()
            self._stale = set()
            return
        self._sharded = ShardedHnsw(
            self.metric, self.mesh, live, self._rows_for(live),
            options=self.params,
        )
        self._built_ids = set(live)
        self._stale = set()

    def search(self, query, limit: int) -> list:
        return self.search_batch(np.asarray(query, np.float32)[None, :], limit)[0]

    def search_batch(self, queries, limit: int) -> list:
        queries = np.asarray(queries, dtype=np.float32)
        if limit == 0 or not self._host._slot_of:
            return [[] for _ in range(len(queries))]
        live = self._live_ids()
        self._maybe_rebuild(live)
        live_set = set(live)
        pending = [id for id in live if id not in self._built_ids or id in self._stale]
        # over-fetch so masked (stale/deleted) graph hits cannot starve the
        # result set
        k_graph = min(len(self._built_ids), limit + len(self._stale))
        graph_hits = (
            self._sharded.search_batch(queries, k_graph) if k_graph else
            [[] for _ in range(len(queries))]
        )
        # pending tail: ONE vectorized [B, T] scan (BLAS), then per query the
        # exact (rank, id) order over the tied top-k candidate set — replaces
        # the per-query host oracle loop that was O(B·T) Python at scale
        tail_ids = tail_raw = tail_rank = None
        if pending:
            tail_ids = np.array(pending, dtype=str)
            tail_raw, tail_rank = _tail_scores(
                self.metric, self._rows_for(pending), queries)
            k = min(limit, len(pending))
            kth = np.partition(tail_rank, k - 1, axis=1)[:, k - 1]
        out = []
        for qi in range(len(queries)):
            merged = [
                (rank_value(self.metric, raw), id, raw)
                for id, raw in graph_hits[qi]
                if id in live_set and id not in self._stale
            ]
            if pending:
                sel = np.flatnonzero(tail_rank[qi] <= kth[qi])  # ties kept
                order = np.lexsort((tail_ids[sel], tail_rank[qi][sel]))
                for j in sel[order][:limit]:
                    merged.append(
                        (float(tail_rank[qi][j]), str(tail_ids[j]),
                         float(tail_raw[qi][j]))
                    )
            merged.sort(key=lambda h: (h[0], h[1]))
            out.append([(id, raw) for _, id, raw in merged[:limit]])
        return out
