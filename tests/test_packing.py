"""Packed sign-bit tests: bit boundaries, padding masking, device parity.

Mirrors distances.rs:540-548 and the word-boundary sweep at
distances.rs:676-707.
"""

import numpy as np
import pytest

from vettore_tpu import errors
from vettore_tpu.ops import packing as p

U64_MAX = 2**64 - 1


class TestCompress:
    def test_reference_examples(self):
        assert p.compress_sign_bits([1.0, -2.0, 0.0]) == [5]
        assert p.compress_sign_bits([1.0, -1.0, 0.0]) == [5]
        assert p.compress_sign_bits([]) == []
        # -0.0 >= 0.0 is true, like the Rust comparison
        assert p.compress_sign_bits([-0.0]) == [1]

    def test_word_boundaries(self):
        for dims in [1, 63, 64, 65, 127, 128, 129]:
            words = p.compress_sign_bits([1.0] * dims)
            assert len(words) == (dims + 63) // 64
            rem = dims % 64
            if rem:
                assert words[-1] == (1 << rem) - 1
            else:
                assert words[-1] == U64_MAX

    def test_invalid(self):
        with pytest.raises(errors.InvalidVector):
            p.compress_sign_bits([float("nan")])
        with pytest.raises(errors.InvalidVector):
            p.compress_sign_bits(["x"])


class TestPackedDistances:
    def test_reference_examples(self):
        left = p.compress_sign_bits([1.0, -1.0, 0.0])
        right = p.compress_sign_bits([-1.0, -1.0, 0.0])
        assert left == [5]
        assert p.packed_hamming(left, right, 3) == 1.0
        assert p.packed_jaccard(left, right, 3) == 0.5

    def test_errors(self):
        left = [5]
        with pytest.raises(errors.InvalidVector):
            p.packed_hamming(left, left, 0)
        with pytest.raises(errors.InvalidVector):
            p.packed_hamming(left, [], 3)
        with pytest.raises(errors.InvalidVector):
            p.packed_jaccard([], [], 1)
        with pytest.raises(errors.InvalidVector):
            p.packed_hamming([-1], [0], 3)
        with pytest.raises(errors.InvalidVector):
            p.packed_hamming([U64_MAX + 1], [0], 3)

    def test_word_boundaries_ignore_padding(self):
        for dims in [1, 63, 64, 65, 127, 128, 129]:
            words = (dims + 63) // 64
            left = [U64_MAX] * words
            right = list(left)
            flipped = [0] + ([dims - 1] if dims > 1 else [])
            for coord in flipped:
                right[coord // 64] ^= 1 << (coord % 64)
            if dims % 64:
                used = (1 << (dims % 64)) - 1
                right[-1] ^= (~used) & U64_MAX  # pollute padding bits
            assert p.packed_hamming(left, right, dims) == len(flipped)
            assert abs(p.packed_jaccard(left, right, dims) - len(flipped) / dims) < 1e-6
        assert p.packed_jaccard([0], [0], 64) == 0.0


class TestDeviceLayout:
    def test_u32_round_trip(self):
        for dims in [1, 31, 32, 33, 63, 64, 65, 129]:
            rng = np.random.default_rng(dims)
            vec = rng.normal(size=dims)
            words = p.compress_sign_bits(list(vec))
            u32 = p.u64_words_to_u32(words, dims)
            assert len(u32) == p.u32_width(dims)
            assert p.u32_words_to_u64(u32) == words

    def test_pack_signs_u32_matches_scalar(self):
        rng = np.random.default_rng(3)
        for dims in [1, 31, 64, 65, 100]:
            mat = rng.normal(size=(7, dims))
            packed = p.pack_signs_u32(mat)
            for i in range(7):
                expected = p.u64_words_to_u32(p.compress_sign_bits(list(mat[i])), dims)
                np.testing.assert_array_equal(packed[i], expected)

    def test_batched_hamming_matches_scalar(self):
        rng = np.random.default_rng(11)
        for dims in [1, 63, 64, 65, 129]:
            mat = rng.normal(size=(9, dims))
            q = rng.normal(size=dims)
            bits = p.pack_signs_u32(mat)
            qbits = np.array(p.u64_words_to_u32(p.compress_sign_bits(list(q)), dims))
            out = np.asarray(p.batched_packed_hamming(bits, qbits))
            for i in range(9):
                expected = p.packed_hamming(
                    p.compress_sign_bits(list(mat[i])), p.compress_sign_bits(list(q)), dims
                )
                assert out[i] == expected
