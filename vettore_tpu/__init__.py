"""vettore-tpu: a TPU-native vector search framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
elchemista/vettore (in-memory vector collections with exact flat search, HNSW
ANN, Matryoshka funnel staging, binary-quantized candidates, ColBERT MaxSim
late interaction, MUVERA fixed-dimensional encodings, hybrid pipelines, MMR
reranking, and checksummed snapshots) — redesigned for TPU hardware: vectors
live in HBM-resident device blocks, scans run as fused MXU matmul + top-k
programs, and collections larger than one chip shard across a
``jax.sharding.Mesh``.

Quick start::

    import vettore_tpu as vt

    col = vt.Collection(name="docs", dimensions=3, index="flat",
                        metric="cosine", normalize="l2")
    col.put_many([
        {"id": "east", "vector": [1.0, 0.0, 0.0], "metadata": {"kind": "axis"}},
        {"id": "north", "vector": [0.0, 1.0, 0.0]},
    ])
    results = col.search([1.0, 0.0, 0.0], limit=2)
"""

import os as _os

# Persistent XLA compilation cache: Pallas/beam kernels take minutes to
# compile on remote-compile backends; caching makes that a one-time cost.
# Opt out with VETTORE_NO_COMPILE_CACHE=1.
if not _os.environ.get("VETTORE_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "VETTORE_COMPILE_CACHE", _os.path.expanduser("~/.cache/vettore_tpu/jax")
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from . import distance, errors, multi_vector, muvera, observability
from .collection import Collection, load_snapshot
from .compat import DB
from .embedding import Embedding, Result
from .index.flat import FlatIndex
from .index.hnsw import HnswIndex
from .metrics import METRICS, metric_code, normalize_metric, result_values
from .ops.scan_host import binary_top_k, vector_top_k
from .store.memory import MemoryStore

__version__ = "0.1.0"

__all__ = [
    "Collection",
    "DB",
    "load_snapshot",
    "Embedding",
    "Result",
    "FlatIndex",
    "HnswIndex",
    "MemoryStore",
    "METRICS",
    "metric_code",
    "normalize_metric",
    "result_values",
    "vector_top_k",
    "binary_top_k",
    "distance",
    "multi_vector",
    "muvera",
    "observability",
    "errors",
    "__version__",
]
