"""Persistent TPU worker: holds one warm device session and executes python
snippets from /tmp/worker_in/NNN.py, writing stdout+traceback to
/tmp/worker_out/NNN.out (then NNN.done marker). Avoids paying the multi-minute
per-process session tax on every experiment."""
import io
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

IN_DIR, OUT_DIR = "/tmp/worker_in", "/tmp/worker_out"
os.makedirs(IN_DIR, exist_ok=True)
os.makedirs(OUT_DIR, exist_ok=True)

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
a = jax.device_put(np.ones((8, 128), np.float32))
jax.device_get(a[:1, :1])
print(f"[worker] session ready in {time.time()-t0:.1f}s", flush=True)

GLOBALS = {"np": np, "jax": jax, "jnp": jnp, "time": time, "os": os, "sys": sys}

done = set(os.listdir(OUT_DIR))
while True:
    jobs = sorted(
        f for f in os.listdir(IN_DIR)
        if f.endswith(".py") and f[:-3] + ".done" not in done
    )
    for job in jobs:
        name = job[:-3]
        out_path = os.path.join(OUT_DIR, name + ".out")
        buf = io.StringIO()
        real = sys.stdout
        try:
            with open(os.path.join(IN_DIR, job)) as fh:
                code = fh.read()
            sys.stdout = buf
            t0 = time.time()
            exec(compile(code, job, "exec"), GLOBALS)
            buf.write(f"\n[worker] job {name} ok in {time.time()-t0:.1f}s\n")
        except BaseException:
            buf.write("\n" + traceback.format_exc())
        finally:
            sys.stdout = real
        with open(out_path, "w") as fh:
            fh.write(buf.getvalue())
        open(os.path.join(OUT_DIR, name + ".done"), "w").close()
        done.add(name + ".done")
        print(f"[worker] finished {name}", flush=True)
    time.sleep(0.5)
