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
* ``MeshHnswIndex`` — host mirror + per-shard wave-built graphs, mutated
  INCREMENTALLY after the first build: puts route to the least-loaded shard
  and wave-link into its graph in place, deletes tombstone on device, and a
  shard compacts alone once its tombstones outgrow
  ``hnsw_build.REBUILD_FRACTION``. No full-mesh rebuild on the ingest path.
"""

from __future__ import annotations

import numpy as np

from ..errors import UnsupportedHnswMetric
from ..index.base import Index
from ..index.flat import FlatIndex
from ..index.hnsw import HNSW_METRICS, validate_options
from ..metrics import normalize_metric, rank_value
from .hnsw_mesh import ShardedHnsw
from .mesh import ShardedFlat


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
    """HNSW sharded over a device mesh, mutated incrementally in place.

    The first search bulk-builds one graph per shard (device wave
    construction). Every put/delete AFTER that build mutates the owning
    shard's graph through the same incremental machinery the single-chip
    index uses (``hnsw_build.incremental_put``/``incremental_delete``,
    hnsw.rs:152-289 semantics): new records route to the least-loaded
    shard, link through one wave kernel, and only that shard's slice of
    the stacked search arrays re-syncs — there is no full-mesh rebuild on
    the ingest path. Deletes tombstone on device; a shard compacts alone
    once its tombstones outgrow ``hnsw_build.REBUILD_FRACTION``."""

    def __init__(self, metric: str, options=None, *, mesh):
        metric = normalize_metric(metric)
        if metric not in HNSW_METRICS:
            raise UnsupportedHnswMetric(metric)
        self.metric = metric
        self.params = validate_options(options)
        self.mesh = mesh
        self._host = FlatIndex(metric)  # mirror + validation
        self._sharded: ShardedHnsw | None = None

    def __len__(self):
        return len(self._host)

    @property
    def dimension(self):
        return self._host.dimension

    def put(self, id: str, vector) -> None:
        self.put_many([(id, vector)])

    def put_many(self, pairs) -> None:
        pairs = [(str(id), v) for id, v in pairs]
        self._host.put_many(pairs)  # batch-validates before any mutation
        if self._sharded is not None:
            ids = [id for id, _ in pairs]
            self._sharded.incremental_put(ids, self._rows_for(ids))

    def delete(self, id: str) -> None:
        self._host.delete(id)
        if self._sharded is not None:
            self._sharded.incremental_delete([str(id)])

    def _live_ids(self) -> list:
        return sorted(self._host._slot_of)

    def _rows_for(self, ids) -> np.ndarray:
        host = self._host
        return np.stack([host._host_x[host._slot_of[id]] for id in ids])

    def _ensure_built(self):
        if self._sharded is not None:
            return
        live = self._live_ids()
        if live:
            self._sharded = ShardedHnsw(
                self.metric, self.mesh, live, self._rows_for(live),
                options=self.params,
            )

    def search(self, query, limit: int) -> list:
        return self.search_batch(np.asarray(query, np.float32)[None, :], limit)[0]

    def search_batch(self, queries, limit: int) -> list:
        queries = np.asarray(queries, dtype=np.float32)
        if limit == 0 or not self._host._slot_of:
            return [[] for _ in range(len(queries))]
        self._ensure_built()
        hits = self._sharded.search_batch(queries, limit)
        # deterministic (rank, id) order is already exact across shards;
        # re-rank host-side only to fold in rank_value for the caller
        out = []
        for qi in range(len(queries)):
            merged = sorted(
                (rank_value(self.metric, raw), id, raw)
                for id, raw in hits[qi]
            )
            out.append([(id, raw) for _, id, raw in merged[:limit]])
        return out
