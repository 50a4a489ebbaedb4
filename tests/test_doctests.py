"""Executable documentation gate.

The reference runs 60 doctests over its public modules as part of CI
(/root/reference/test/doctest_test.exs:4-6); this is the equivalent gate:
every ``>>>`` example in the public API docstrings executes and its output
matches, and the total example count stays at or above the reference's bar
so the docs cannot silently decay into prose.
"""

from __future__ import annotations

import doctest

import vettore_tpu
import vettore_tpu.collection
import vettore_tpu.metrics
import vettore_tpu.multi_vector
import vettore_tpu.observability
import vettore_tpu.ops.distance
import vettore_tpu.ops.mmr
import vettore_tpu.ops.muvera
import vettore_tpu.ops.packing
import vettore_tpu.ops.scan_host

MODULES = (
    vettore_tpu,
    vettore_tpu.collection,
    vettore_tpu.metrics,
    vettore_tpu.multi_vector,
    vettore_tpu.observability,
    vettore_tpu.ops.distance,
    vettore_tpu.ops.mmr,
    vettore_tpu.ops.muvera,
    vettore_tpu.ops.packing,
    vettore_tpu.ops.scan_host,
)

#: the reference's doctest count — the executable-example floor
MIN_EXAMPLES = 60


def test_all_docstring_examples_execute():
    attempted, failed = 0, 0
    for mod in MODULES:
        result = doctest.testmod(
            mod, verbose=False,
            optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS)
        attempted += result.attempted
        failed += result.failed
    assert failed == 0, f"{failed} doctest example(s) failed (see stdout)"
    assert attempted >= MIN_EXAMPLES, (
        f"only {attempted} doctest examples — the executable-doc floor is "
        f"{MIN_EXAMPLES} (reference: doctest_test.exs)")
