"""Host-RAM footprint of a 1M x 768 collection (VERDICT r3 item 10).

Ingest is host-only until the first search (device blocks build lazily),
so this measures exactly the canonical-store + index-mirror RSS. Run:

    python _exp/host_rss.py --n 1000000 [--store columnar]
"""
import argparse
import gc
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gib():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2**20
    return float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--store", default="memory")
    args = p.parse_args()

    import vettore_tpu as vt

    base = rss_gib()
    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    ids = [f"doc-{i:07d}" for i in range(args.n)]
    corpus = rss_gib()
    vec_gib = data.nbytes / 2**30
    print(f"[rss] base {base:.2f} GiB; +corpus ({vec_gib:.2f} GiB data) "
          f"-> {corpus:.2f} GiB", flush=True)

    col = vt.Collection(name="rss", dimensions=args.d, metric="cosine",
                        index="flat",
                        **({"store": args.store} if args.store != "memory"
                           else {}))
    col.put_matrix(ids, data)
    after = rss_gib()
    del data
    gc.collect()
    dropped = rss_gib()
    overhead = dropped - base - vec_gib
    print(f"[rss] store={args.store} after ingest {after:.2f} GiB; after "
          f"corpus free {dropped:.2f} GiB "
          f"(= vectors {vec_gib:.2f} + overhead {overhead:.2f} GiB)",
          flush=True)

    # sanity: records hydrate
    e = col.get(ids[123])
    v = np.asarray(e.vector, dtype=np.float32)
    assert v.shape == (args.d,) and np.isfinite(v).all()
    print("[rss] get() hydration ok", flush=True)


if __name__ == "__main__":
    main()
