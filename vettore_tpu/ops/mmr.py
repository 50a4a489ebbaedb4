"""Maximal Marginal Relevance reranking.

Mirrors ``Vettore.Distance.mmr_rerank/5``
(/root/reference/lib/vettore_distance.ex:325-519): greedy selection of
``final_k`` items maximizing ``alpha * query_score - (1 - alpha) *
max_similarity_to_selected``; ties pick the earliest remaining candidate.
Pair similarity per metric: cosine = true cosine; inner_product = dot;
negative_inner_product = -raw; distance metrics = 1 / (1 + distance).
"""

from __future__ import annotations

import math
from numbers import Real

import numpy as np

from ..errors import InvalidMmrArgs, UnknownMetric
from ..metrics import DISTANCE_METRICS, SIMILARITY_METRICS
from .distance import _check_f32, _raw_f64, _finite_f32


def _pair_similarity(metric: str, a: np.ndarray, b: np.ndarray) -> float:
    if metric == "cosine":
        na = math.sqrt(float(np.dot(a, a)))
        nb = math.sqrt(float(np.dot(b, b)))
        if na == 0.0 or nb == 0.0:
            return 0.0
        sim = float(np.dot(a, b)) / (na * nb)
        return float(np.float32(min(1.0, max(-1.0, sim))))
    raw = _raw_f64(metric, a, b)
    if metric not in ("hamming", "jaccard"):
        raw = _check_f32(raw)
    else:
        raw = float(np.float32(raw))
    if metric == "inner_product":
        return raw
    if metric == "negative_inner_product":
        return -raw
    return 1.0 / (1.0 + raw)


def mmr_rerank(initial, embeddings, metric, alpha, final_k) -> list:
    """Returns the reranked ``[(id, query_score)]`` prefix of length ≤ final_k."""
    if (
        not isinstance(initial, list)
        or not isinstance(embeddings, list)
        or isinstance(alpha, bool)
        or not isinstance(alpha, Real)
        or not 0 <= float(alpha) <= 1
        or isinstance(final_k, bool)
        or not isinstance(final_k, int)
        or final_k <= 0
    ):
        raise InvalidMmrArgs("invalid mmr args")
    if metric not in SIMILARITY_METRICS and metric not in DISTANCE_METRICS:
        raise UnknownMetric(metric)
    alpha = float(alpha)

    vectors: dict[str, np.ndarray] = {}
    expected = None
    for item in embeddings:
        if not (isinstance(item, tuple) and len(item) == 2):
            raise InvalidMmrArgs("invalid mmr embedding")
        id, vector = item
        if not isinstance(id, str) or id == "" or not isinstance(vector, (list, tuple)) or not vector:
            raise InvalidMmrArgs("invalid mmr embedding")
        if id in vectors:
            raise InvalidMmrArgs("duplicate mmr embedding id")
        if expected is not None and len(vector) != expected:
            raise InvalidMmrArgs("mmr dimension mismatch")
        if not all(_finite_f32(v) for v in vector):
            raise InvalidMmrArgs("non-finite mmr vector")
        vectors[id] = np.asarray(vector, dtype=np.float64)
        expected = expected or len(vector)

    seen = set()
    for item in initial:
        if not (isinstance(item, tuple) and len(item) == 2):
            raise InvalidMmrArgs("invalid mmr initial entry")
        id, query_score = item
        if (
            not isinstance(id, str)
            or id == ""
            or not _finite_f32(query_score)
            or id not in vectors
            or id in seen
        ):
            raise InvalidMmrArgs("invalid mmr initial entry")
        seen.add(id)

    remaining = list(initial)
    selected: list = []
    while remaining and len(selected) < final_k:
        best_idx, best_score = None, None
        for idx, (id, query_score) in enumerate(remaining):
            if selected:
                redundancy = max(
                    _pair_similarity(metric, vectors[id], vectors[sel_id])
                    for sel_id, _ in selected
                )
            else:
                redundancy = 0.0
            mmr_score = alpha * float(query_score) - (1.0 - alpha) * redundancy
            if best_score is None or mmr_score > best_score:
                best_idx, best_score = idx, mmr_score
        selected.append(remaining.pop(best_idx))
    return selected
