"""Benchmark harness: prints ONE JSON line with the headline metric.

Follows the reference's bench methodology
(/root/reference/bench/search_modes_bench.exs): deterministic seed, an
overlap@k preflight gate against the exact oracle BEFORE any timing, then
throughput measurement. The BASELINE.md configs drive the scenarios.

Round-1 headline: flat exact cosine at 100k x 384 (BASELINE config 1),
batched QPS on one TPU chip at recall@10 == 1.0 (exact search).
``vs_baseline`` compares against a measured single-core CPU scan of the same
workload (the stand-in for the reference's single-core Rust NIF scan — the
reference publishes no absolute numbers, BASELINE.md).

Run: python bench.py            (full scale)
     python bench.py --smoke    (tiny preflight, CI-style)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

SEED = 20_260_721


def build_corpus(n, d):
    rng = np.random.default_rng(SEED)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    return data


def preflight_overlap(index, data, ids, limit=10, probes=4) -> float:
    """overlap@k of the device search vs the float64 host oracle (the
    reference's deterministic preflight gate, search_modes_bench.exs)."""
    from vettore_tpu.ops import scan_host

    rng = np.random.default_rng(SEED + 1)
    d = data.shape[1]
    overlaps = []
    pairs = list(zip(ids, data))
    for _ in range(probes):
        q = rng.normal(size=d).astype(np.float64)
        q /= np.linalg.norm(q)
        got = {id for id, _ in index.search(list(q), limit)}
        expected = {id for id, _ in scan_host.vector_top_k(pairs, list(q), "cosine", d, limit)}
        overlaps.append(len(got & expected) / limit)
    return float(np.mean(overlaps))


def cpu_single_core_qps(data, queries, limit=10) -> float:
    """Single-core CPU scan of the same workload in a constrained subprocess
    (stand-in for the reference's single-core Rust NIF flat scan)."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        np.save(f"{tmp}/data.npy", data)
        np.save(f"{tmp}/queries.npy", queries[:32])
        code = f"""
import numpy as np, time
data = np.load("{tmp}/data.npy")
queries = np.load("{tmp}/queries.npy")
# warm
scores = data @ queries[0]
np.argpartition(-scores, {limit})[:{limit}]
t0 = time.perf_counter()
for q in queries:
    scores = data @ q
    np.argpartition(-scores, {limit})[:{limit}]
dt = time.perf_counter() - t0
print(len(queries) / dt)
"""
        env = dict(os.environ)
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            env[var] = "1"
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=600
        )
        return float(out.stdout.strip().splitlines()[-1])


def main():
    smoke = "--smoke" in sys.argv
    n, d = (1_000, 64) if smoke else (100_000, 384)
    batch = 256 if smoke else 4096
    limit = 10

    import vettore_tpu as vt

    data = build_corpus(n, d)
    ids = [f"doc-{i:06d}" for i in range(n)]

    t0 = time.perf_counter()
    index = vt.FlatIndex("cosine")
    index.put_many(zip(ids, data))
    build_s = time.perf_counter() - t0

    overlap = preflight_overlap(index, data, ids, limit=limit)
    if overlap < 1.0:
        print(json.dumps({"metric": "preflight_failed", "value": overlap,
                          "unit": "overlap@10", "vs_baseline": None}))
        sys.exit(1)

    rng = np.random.default_rng(SEED + 2)
    queries = data[rng.integers(0, n, batch)]
    index.search_batch(queries, limit)  # warm/compile
    iters = 2 if smoke else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        index.search_batch(queries, limit)
    qps = batch * iters / (time.perf_counter() - t0)

    baseline_qps = cpu_single_core_qps(data, queries)

    print(json.dumps({
        "metric": f"flat_exact_cosine_qps_{n}x{d}@recall10={overlap:.2f}",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
        "detail": {
            "build_s": round(build_s, 2),
            "batch": batch,
            "overlap_at_10": overlap,
            "cpu_single_core_qps": round(baseline_qps, 1),
        },
    }))


if __name__ == "__main__":
    main()
