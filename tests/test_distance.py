"""Distance kernel tests.

Mirrors the reference's distance suite: metric values and rank semantics
(distances.rs:496-515), validation (distances.rs:518-537), overflow recovery
(distances.rs:612-635), normalization invariants (distances.rs:638-673), and
the SIMD-vs-oracle differential tests (distances.rs:571-609) re-aimed at the
batched device kernels.
"""

import math

import numpy as np
import pytest

from vettore_tpu import errors
from vettore_tpu.metrics import (
    METRICS,
    metric_code,
    metric_from_code,
    normalize_metric,
    rank_value,
    result_values,
    similarity_value,
)
from vettore_tpu.ops import distance as d

F32_MAX = 3.4028234663852886e38


class TestPairwiseMetrics:
    def test_every_metric_and_rank_semantics(self):
        left = [1.0, 0.0, 1.0]
        right = [0.0, 1.0, 1.0]
        assert d.l2_squared(left, right) == 2.0
        assert abs(d.l2(left, right) - math.sqrt(2.0)) < 1e-6
        assert d.compute("cosine", left, right) == 1.0  # plain dot on this path
        assert d.inner_product(left, right) == 1.0
        assert d.negative_inner_product(left, right) == -1.0
        assert d.manhattan(left, right) == 2.0
        assert d.chebyshev(left, right) == 1.0
        assert d.hamming(left, right) == 2.0
        assert abs(d.jaccard(left, right) - 2.0 / 3.0) < 1e-6
        assert rank_value("inner_product", 2.0) == -2.0
        assert rank_value("cosine", 0.25) == 0.75
        assert similarity_value("negative_inner_product", -3.0) == 3.0
        assert similarity_value("l2", 1.0) == 0.5

    def test_aliases(self):
        assert d.euclidean([0.0, 0.0], [3.0, 4.0]) == 5.0
        assert d.dot_product([1.0, 2.0], [3.0, 4.0]) == 11.0
        assert normalize_metric("euclidean") == "l2"
        assert normalize_metric("dot") == "inner_product"
        assert normalize_metric("dot_product") == "inner_product"

    def test_metric_codes(self):
        for code, name in enumerate(METRICS):
            assert metric_code(name) == code
            assert metric_from_code(code) == name
        with pytest.raises(errors.UnknownMetric):
            metric_from_code(9)
        with pytest.raises(errors.UnknownMetric):
            metric_code("nope")

    def test_validation(self):
        with pytest.raises(errors.DimensionMismatch):
            d.l2([1.0], [1.0, 2.0])
        with pytest.raises(errors.InvalidVector):
            d.l2([1.0, float("nan")], [1.0, 2.0])
        with pytest.raises(errors.InvalidVector):
            d.l2([1.0, "bad"], [1.0, 2.0])
        with pytest.raises(errors.InvalidVector):
            d.hamming([float("nan")], [0.0])
        with pytest.raises(errors.UnknownMetric):
            d.compute("nope", [1.0], [1.0])

    def test_cosine_helper(self):
        assert d.cosine([2.0, 0.0], [4.0, 0.0]) == 1.0
        assert d.cosine([0.0, 0.0], [4.0, 0.0]) == 0.0
        assert d.cosine([2.0, 0.0], [4.0, 0.0], normalize="none") == 8.0
        assert abs(d.cosine([2.0, 0.0], [-5.0, 0.0]) - (-1.0)) < 1e-6
        assert abs(d.cosine([3.0, 4.0], [6.0, 8.0]) - 1.0) < 1e-6
        assert d.cosine([], []) == 0.0
        with pytest.raises(errors.DimensionMismatch):
            d.cosine([1.0], [1.0, 2.0])
        with pytest.raises(errors.UnknownNormalization):
            d.cosine([1.0], [1.0], normalize="bogus")
        # max-magnitude inputs still normalize cleanly
        normalized = d.true_cosine([F32_MAX, F32_MAX], [F32_MAX, F32_MAX])
        assert abs(normalized - 1.0) < 1e-6

    def test_overflow_recovery(self):
        large = 1.0e20
        assert abs(d.l2([large], [0.0]) - large) / large < 1e-6
        assert d.inner_product([F32_MAX, F32_MAX], [2.0, -2.0]) == 0.0
        assert d.negative_inner_product([F32_MAX, F32_MAX], [2.0, -2.0]) == 0.0
        with pytest.raises(errors.MetricOverflow):
            d.l2_squared([large], [0.0])
        with pytest.raises(errors.MetricOverflow):
            d.l2([F32_MAX, F32_MAX], [0.0, 0.0])
        with pytest.raises(errors.MetricOverflow):
            d.manhattan([F32_MAX, F32_MAX], [0.0, 0.0])
        with pytest.raises(errors.MetricOverflow):
            d.chebyshev([F32_MAX], [-F32_MAX])
        assert d.jaccard([0.0, 0.0], [0.0, 0.0]) == 0.0


class TestNormalize:
    def test_modes(self):
        out = d.normalize_vector([3.0, 4.0], "l2")
        assert [round(x, 1) for x in out] == [0.6, 0.8]
        assert d.normalize_vector([0.0, 0.0], "l2") == [0.0, 0.0]
        assert d.normalize_vector([4.0, 4.0], "zscore") == [0.0, 0.0]
        assert d.normalize_vector([7.0, 7.0], "minmax") == [0.0, 0.0]
        assert d.normalize_vector([2.0, 4.0, 6.0], "minmax") == [0.0, 0.5, 1.0]
        assert d.normalize_vector([-7.0, 0.0, 21.0], "minmax") == [0.0, 0.25, 1.0]
        assert d.normalize_vector([], "l2") == []
        assert d.normalize_vector([], "zscore") == []
        assert d.normalize_vector([1, 2], "none") == [1.0, 2.0]

    def test_invariants(self):
        l2n = np.array(d.normalize_vector([3.0, -4.0, 12.0], "l2"), dtype=np.float64)
        assert abs(float(l2n @ l2n) - 1.0) < 1e-6
        z = np.array(d.normalize_vector([1.0, 2.0, 3.0, 4.0], "zscore"))
        assert abs(z.mean()) < 1e-6
        assert abs(z.var() - 1.0) < 1e-5
        big = d.normalize_vector([F32_MAX, F32_MAX], "l2")
        assert abs(big[0] - 1 / math.sqrt(2)) < 1e-6
        assert d.normalize_vector([-F32_MAX, F32_MAX], "minmax") == [0.0, 1.0]

    def test_errors(self):
        with pytest.raises(errors.UnknownNormalization):
            d.normalize_vector([1.0], "unknown")
        for bad in [float("nan"), float("inf"), -float("inf")]:
            for mode in ("l2", "zscore", "minmax", "none"):
                with pytest.raises(errors.InvalidVector):
                    d.normalize_vector([bad], mode)


class TestResultValues:
    def test_semantics(self):
        assert result_values("l2", 5.0, "raw") == (-5.0, 5.0)
        assert result_values("cosine", 0.25, "raw") == (0.25, 0.75)
        assert result_values("inner_product", 2.0, "raw") == (2.0, -2.0)
        assert result_values("negative_inner_product", 3.0, "raw") == (-3.0, 3.0)
        assert result_values("negative_inner_product", 3.0, "similarity") == (-3.0, 3.0)
        assert result_values("l2", 5.0, "similarity") == (1.0 / 6.0, 5.0)
        assert result_values("cosine", 0.25, "similarity") == (0.625, 0.75)
        assert result_values("inner_product", 2.0, "similarity") == (2.0, -2.0)
        assert result_values("bogus", 1.5, "raw") == (1.5, None)


class TestBatchedKernels:
    """Differential oracle: device batch scoring vs the float64 pairwise API
    (the analog of distances.rs:571-609)."""

    @pytest.mark.parametrize("metric", METRICS)
    @pytest.mark.parametrize("dims", [1, 3, 7, 8, 9, 40])
    def test_matches_pairwise_oracle(self, metric, dims):
        rng = np.random.default_rng(20260721)
        n = 23
        x = np.round(rng.normal(size=(n, dims)) * 4, 3)
        x[::3, 0] = 0.0  # exercise truthiness metrics
        q = np.round(rng.normal(size=dims) * 4, 3)
        raw = np.asarray(d.batched_raw_scores(x.astype(np.float32), q.astype(np.float32), metric=metric))
        for i in range(n):
            expected = d.compute(metric, list(q), list(x[i]))
            scale = max(1.0, abs(expected))
            assert abs(raw[i] - expected) <= 4e-6 * scale, (metric, i)

    @pytest.mark.parametrize("dims", [1, 5, 16])
    def test_true_cosine_matches_oracle(self, dims):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(17, dims))
        x[0] = 0.0  # zero-norm row → 0.0
        q = rng.normal(size=dims)
        raw = np.asarray(
            d.batched_raw_scores(
                x.astype(np.float32), q.astype(np.float32), metric="cosine", use_true_cosine=True
            )
        )
        for i in range(17):
            expected = d.true_cosine(list(x[i]), list(q))
            assert abs(raw[i] - expected) <= 4e-6

    def test_recover_overflow(self):
        x = np.array([[F32_MAX, F32_MAX], [1.0, 0.0]], dtype=np.float32)
        q = np.array([2.0, -2.0], dtype=np.float32)
        raw = np.asarray(d.batched_raw_scores(x, q, metric="inner_product"))
        assert not np.isfinite(raw[0])
        recovered = d.recover_overflow("inner_product", x, q, raw)
        assert recovered[0] == 0.0
        assert recovered[1] == 2.0
        with pytest.raises(errors.MetricOverflow):
            d.recover_overflow(
                "manhattan",
                np.array([[F32_MAX, F32_MAX]], dtype=np.float32),
                np.array([0.0, 0.0], dtype=np.float32),
                np.array([np.inf], dtype=np.float32),
            )
