"""vettore-tpu: a TPU-native vector search framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
elchemista/vettore (in-memory vector collections with exact flat search, HNSW
ANN, Matryoshka funnel staging, binary-quantized candidates, ColBERT MaxSim
late interaction, MUVERA fixed-dimensional encodings, hybrid pipelines, MMR
reranking, and checksummed snapshots) — redesigned for TPU hardware: vectors
live in HBM-resident device blocks, scans run as fused MXU matmul + top-k
programs, and collections larger than one chip shard across a
``jax.sharding.Mesh``.
"""

from . import errors
from .embedding import Embedding, Result
from .index.flat import FlatIndex
from .metrics import METRICS, metric_code, normalize_metric, result_values
from .store.memory import MemoryStore

__version__ = "0.1.0"

__all__ = [
    "Embedding",
    "Result",
    "FlatIndex",
    "MemoryStore",
    "METRICS",
    "metric_code",
    "normalize_metric",
    "result_values",
    "errors",
    "__version__",
]
