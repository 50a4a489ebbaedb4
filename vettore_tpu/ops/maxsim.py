"""ColBERT MaxSim (Chamfer) late-interaction scoring.

Host pairwise path mirrors /root/reference/native/vettore/src/multi_vector.rs:
each query vector takes its best document-vector similarity; the score is the
sum. Empty query or document side scores 0.0 but the non-empty side is still
validated (multi_vector.rs:44-60,101-111).

The device path (`batched_maxsim_scores`) scores a padded ``[D, T, d]`` token
block against ``[Q, d]`` queries in one MXU einsum — the TPU-native
replacement for the nested Rust loops — and is used by the collection's
multi-vector search and hybrid rerank.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import DimensionMismatch, InvalidVector, ScoreOverflow
from ..metrics import similarity_value, validate_metric
from .distance import _check_f32, _raw_f64, validate_vector


def _validate_matrix(vectors, dimension=None):
    """Validates a list of equal-length finite vectors; returns the dimension
    (or None for an empty list)."""
    if not isinstance(vectors, (list, tuple)):
        raise InvalidVector("vectors must be a list")
    if not vectors:
        return dimension
    first_len = len(vectors[0])
    if first_len == 0:
        raise InvalidVector("vectors must not be empty")
    expected = dimension if dimension is not None else first_len
    for v in vectors:
        if len(v) != expected:
            raise DimensionMismatch("dimension mismatch")
        validate_vector(list(v))
    return expected


def _pair_similarity(metric: str, q: np.ndarray, t: np.ndarray) -> float:
    if metric == "cosine":
        nq = math.sqrt(float(np.dot(q, q)))
        nt = math.sqrt(float(np.dot(t, t)))
        raw = 0.0 if nq == 0.0 or nt == 0.0 else float(
            np.float32(min(1.0, max(-1.0, float(np.dot(q, t)) / (nq * nt))))
        )
    else:
        raw = _raw_f64(metric, q, t)
        if metric not in ("hamming", "jaccard"):
            raw = _check_f32(raw)
        else:
            raw = float(np.float32(raw))
    return similarity_value(metric, raw)


def score(query_vectors, document_vectors, metric="cosine") -> float:
    """One MaxSim score (``MultiVector.chamfer/colbert_score``,
    multi_vector.rs:40-87)."""
    metric = validate_metric(metric)
    if not query_vectors:
        _validate_matrix(document_vectors)
        return 0.0
    dimension = _validate_matrix(query_vectors)
    if not document_vectors:
        return 0.0
    _validate_matrix(document_vectors, dimension)

    total = 0.0
    for q in query_vectors:
        qa = np.asarray(q, dtype=np.float64)
        best = -math.inf
        for t in document_vectors:
            best = max(best, _pair_similarity(metric, qa, np.asarray(t, dtype=np.float64)))
        # the reference accumulates the running total in f32
        # (multi_vector.rs:70-86); overflow past f32 range is an error
        with np.errstate(over="ignore"):
            total = float(np.float32(total + best))
        if not math.isfinite(total):
            raise ScoreOverflow("score overflow")
    return total


def top_k(documents, query_vectors, metric="cosine", limit: int = 10) -> list:
    """Batched MaxSim over ``[(id, [vectors])]``; highest score first, ties by
    lexicographically smaller id (multi_vector.rs:90-132)."""
    metric = validate_metric(metric)
    _validate_matrix(query_vectors)
    query_dim = len(query_vectors[0]) if query_vectors else None

    hits = []
    for id, vectors in documents:
        if query_dim is None:
            _validate_matrix(vectors)
            doc_score = 0.0
        elif not vectors:
            doc_score = 0.0
        else:
            _validate_matrix(vectors, query_dim)
            doc_score = score(query_vectors, vectors, metric)
        hits.append((doc_score, str(id)))
    hits.sort(key=lambda h: (-h[0], h[1]))
    return [(id, s) for s, id in hits[:limit]]


# ---------------------------------------------------------------------------
# Device batched kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric",))
def batched_maxsim_scores(tokens, token_counts, queries, *, metric: str):
    """MaxSim totals for a padded doc-token block.

    ``tokens``: [D, T, d] float32 (zero-padded), ``token_counts``: [D] int32,
    ``queries``: [Q, d] float32 → ``(totals [D] f32, pair_finite [D] bool)``.
    Docs with zero tokens score 0.0. Padded token positions are masked out of
    the max. ``pair_finite`` flags docs whose pair scores stayed finite (f32
    overflow triggers the host float64 recovery path).
    """
    D, T, d = tokens.shape
    Q = queries.shape[0]
    hp = jax.lax.Precision.HIGHEST
    if metric in ("cosine", "inner_product", "negative_inner_product"):
        sim = jnp.einsum("qd,ntd->nqt", queries, tokens, precision=hp,
                         preferred_element_type=jnp.float32)
        if metric == "cosine":
            qn = jnp.sqrt(jnp.sum(queries**2, axis=1))  # [Q]
            tn = jnp.sqrt(jnp.sum(tokens**2, axis=2))  # [D, T]
            denom = qn[None, :, None] * tn[:, None, :]
            sim = jnp.where(denom > 0.0, sim / denom, 0.0)
            sim = jnp.clip(sim, -1.0, 1.0)
        # negative_inner_product: raw = -dot, similarity = -raw = dot — the
        # einsum value is already the similarity.
    elif metric in ("l2", "l2_squared"):
        dots = jnp.einsum("qd,ntd->nqt", queries, tokens, precision=hp,
                          preferred_element_type=jnp.float32)
        qsq = jnp.sum(queries**2, axis=1)[None, :, None]
        tsq = jnp.sum(tokens**2, axis=2)[:, None, :]
        dist_sq = jnp.maximum(qsq + tsq - 2.0 * dots, 0.0)
        dist = jnp.sqrt(dist_sq) if metric == "l2" else dist_sq
        sim = 1.0 / (1.0 + dist)
    else:
        # elementwise metrics: [D, Q, T, d] broadcast (used on candidate sets)
        diff_src = tokens[:, None, :, :]
        q_src = queries[None, :, None, :]
        if metric == "manhattan":
            dist = jnp.sum(jnp.abs(diff_src - q_src), axis=3)
        elif metric == "chebyshev":
            dist = jnp.max(jnp.abs(diff_src - q_src), axis=3)
        elif metric == "hamming":
            dist = jnp.sum((diff_src != 0.0) != (q_src != 0.0), axis=3).astype(jnp.float32)
        elif metric == "jaccard":
            lt = diff_src != 0.0
            rt = q_src != 0.0
            union = jnp.sum(lt | rt, axis=3).astype(jnp.float32)
            inter = jnp.sum(lt & rt, axis=3).astype(jnp.float32)
            dist = jnp.where(union > 0.0, 1.0 - inter / union, 0.0)
        else:
            raise ValueError(f"unknown metric {metric}")
        sim = 1.0 / (1.0 + dist)

    token_mask = jnp.arange(T)[None, :] < token_counts[:, None]  # [D, T]
    pair_finite = jnp.all(jnp.isfinite(sim) | ~token_mask[:, None, :], axis=(1, 2))
    masked = jnp.where(token_mask[:, None, :], sim, -jnp.inf)
    best = jnp.max(masked, axis=2)  # [D, Q]
    totals = jnp.sum(best, axis=1)  # [D]
    totals = jnp.where(token_counts > 0, totals, 0.0)
    if Q == 0:
        totals = jnp.zeros(D, jnp.float32)
    return totals, pair_finite
