"""1M-row snapshot round-trip timing: save, load (bulk index rebuild),
search parity. Writes docs/snapshot_1m.json."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import cached_corpus, make_queries

T0 = time.perf_counter()


def phase(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def main():
    from vettore_tpu.collection import Collection, load_snapshot

    N, D = 1_000_000, 768
    phase("corpus")
    data = cached_corpus(N, D)
    queries = make_queries(data, 8)
    ids = [f"doc-{i:07d}" for i in range(N)]

    phase("ingest")
    col = Collection(name="snap1m", dimensions=D, metric="cosine", index="flat")
    t0 = time.perf_counter()
    col.put_matrix(ids, data)
    ingest_s = time.perf_counter() - t0

    before = [[(r.id, r.score) for r in col.search(list(q), limit=5)]
              for q in queries[:4]]

    path = "/root/.cache/vettore_bench/snap_1m.bin"
    phase("snapshot save")
    t0 = time.perf_counter()
    col.snapshot(path)
    save_s = time.perf_counter() - t0
    size_gb = os.path.getsize(path) / 2**30
    phase(f"saved {size_gb:.2f} GiB in {save_s:.1f}s")

    phase("snapshot load (validate + bulk index rebuild)")
    t0 = time.perf_counter()
    loaded = load_snapshot(path)
    load_s = time.perf_counter() - t0
    phase(f"loaded in {load_s:.1f}s")

    after = [[(r.id, r.score) for r in loaded.search(list(q), limit=5)]
             for q in queries[:4]]
    parity = before == after
    phase(f"search parity: {parity}")

    result = {"rows": N, "dims": D, "file_gib": round(size_gb, 2),
              "ingest_s": round(ingest_s, 1), "save_s": round(save_s, 1),
              "load_s": round(load_s, 1), "search_parity": parity}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "snapshot_1m.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    phase(f"wrote {out}: {result}")
    os.unlink(path)


if __name__ == "__main__":
    main()
