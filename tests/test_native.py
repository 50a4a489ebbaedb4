"""Native C++ host-op tests: bit-exact parity with the Python reference
implementations (skipped when no toolchain is available)."""

import numpy as np
import pytest

from vettore_tpu import native
from vettore_tpu.index.hnsw import fnv1a_64, level_for
from vettore_tpu.ops.packing import compress_sign_bits, packed_hamming, pack_signs_u64_rows

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

IDS = ["a", "b", "stable-id", "another-id", "", "doc-0001234", "éü世界"]


def test_fnv_batch_matches_python():
    out = native.fnv1a64_batch(IDS)
    expected = [fnv1a_64(s.encode("utf-8")) for s in IDS]
    assert [int(h) for h in out] == expected


def test_levels_batch_matches_python():
    out = native.levels_batch(IDS, 12)
    assert [int(l) for l in out] == [level_for(s, 12) for s in IDS]


def test_pack_signs_matches_python():
    rng = np.random.default_rng(0)
    for dims in (1, 63, 64, 65, 129):
        m = rng.normal(size=(5, dims))
        m[0, 0] = -0.0  # -0.0 counts as non-negative
        out = native.pack_signs_u64(m)
        expected = pack_signs_u64_rows(m)
        np.testing.assert_array_equal(out, expected)


def test_hamming_scan_matches_python():
    rng = np.random.default_rng(1)
    dims = 129
    rows = rng.normal(size=(7, dims))
    q = rng.normal(size=dims)
    packed_rows = native.pack_signs_u64(rows)
    packed_q = native.pack_signs_u64(q[None, :])[0]
    out = native.hamming_scan(packed_rows, packed_q)
    for i in range(7):
        expected = packed_hamming(
            compress_sign_bits(list(rows[i])), compress_sign_bits(list(q)), dims
        )
        assert out[i] == expected
