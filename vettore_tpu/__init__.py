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

from . import distance, errors, multi_vector, muvera
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
    "errors",
    "__version__",
]
