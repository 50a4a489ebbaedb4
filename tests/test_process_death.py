"""Crash-safety across REAL process death (SURVEY §5.3 / verdict item #16).

The reference's supervision story is OTP: a DynamicSupervisor restarts
nothing (owners are :temporary) but tables survive the *creator's* death and
collections are always reconstructible from the canonical store
(/root/reference/lib/vettore/application.ex:8-12,
/root/reference/lib/vettore/ets_owner.ex:55-62, tested by killing the
creating process at /root/reference/test/vector_hardening_test.exs:130-145).

This library has no process model — its analog is restart-by-rebuild: the
snapshot subsystem's atomic tmp+rename discipline must guarantee that a
process SIGKILLed at ANY point (mid-ingest, mid-snapshot) leaves the last
completed snapshot loadable and the search results exact. These tests kill a
real child process (SIGKILL, no cleanup handlers run) and verify the parent
can always recover.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np

import vettore_tpu as vt

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(body: str) -> subprocess.Popen:
    """Runs ``body`` in a fresh CPU-backend interpreter; the child prints
    progress lines on stdout so the parent can kill it at a known phase."""
    code = textwrap.dedent(body)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    return subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdout=subprocess.PIPE, text=True, env=env, cwd=_REPO)


def _wait_for(proc: subprocess.Popen, marker: str, timeout_s: float = 120.0):
    """Reads child stdout with a REAL deadline: a reader thread feeds a
    queue, so a silently wedged child (no output at all) still fails at
    ``timeout_s`` instead of blocking the suite forever on readline."""
    import queue
    import threading

    lines: queue.Queue = queue.Queue()
    def _reader():
        for line in proc.stdout:
            lines.put(line)
        lines.put(None)  # EOF

    t = threading.Thread(target=_reader, daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            line = lines.get(timeout=max(0.0, deadline - time.monotonic()))
        except queue.Empty:
            raise AssertionError(
                f"child never printed {marker!r} within {timeout_s}s")
        if line is None:
            raise AssertionError(f"child exited before printing {marker!r}")
        if marker in line:
            return


def test_sigkill_mid_snapshot_keeps_last_good_snapshot(tmp_path):
    """Child writes snapshot v1, then loops re-snapshotting to the SAME path
    until SIGKILLed mid-write. The atomic tmp+rename contract: the path must
    always hold either v1's or a complete later version's bytes — never a
    torn file — so the parent's load + search succeed."""
    snap = tmp_path / "col.snap"
    proc = _spawn(f"""
        import numpy as np
        import vettore_tpu as vt

        rng = np.random.default_rng(7)
        col = vt.Collection(name="crash", dimensions=32, metric="cosine",
                            index="flat")
        vecs = rng.normal(size=(64, 32)).astype(np.float32)
        col.put_many([{{"id": f"doc-{{i:03d}}", "vector": [float(v) for v in vecs[i]]}}
                      for i in range(64)])
        col.snapshot({str(snap)!r})
        print("V1-DONE", flush=True)
        i = 0
        while True:  # re-snapshot forever; parent SIGKILLs us mid-loop
            col.snapshot({str(snap)!r})
            i += 1
            if i == 1:
                print("LOOPING", flush=True)
    """)
    try:
        _wait_for(proc, "LOOPING")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
        assert proc.returncode == -signal.SIGKILL
    finally:
        if proc.poll() is None:
            proc.kill()

    # no cleanup handler ran in the child: the path (or a complete
    # predecessor) must still load — torn writes would raise InvalidSnapshot
    loaded = vt.load_snapshot(str(snap))
    res = loaded.search(loaded.get("doc-005").vector, limit=3)
    assert res[0].id == "doc-005"
    assert len(loaded.all()) == 64
    loaded.close()

    # leftover tmp files from the interrupted write: the guaranteed contract
    # is NO TORN LOADS — a SIGKILL can land after the tmp file is fully
    # written+closed but before os.replace, leaving a complete checksum-valid
    # tmp, so loading one must either raise InvalidSnapshot (partial bytes)
    # or yield the complete 64-record snapshot — never a partial state
    stale = [p for p in os.listdir(tmp_path) if p != "col.snap"]
    for name in stale:
        try:
            extra = vt.load_snapshot(str(tmp_path / name))
        except Exception:
            continue  # torn tmp rejected — the common case
        assert len(extra.all()) == 64
        extra.close()


def test_sigkill_mid_ingest_rebuilds_from_snapshot(tmp_path):
    """Death mid-put_many loses only un-snapshotted work: the parent restores
    the checkpoint and re-drives the remaining ingest to the exact final
    state — the restart-by-rebuild analog of the reference's supervisor test
    (vector_hardening_test.exs:130-145)."""
    snap = tmp_path / "ingest.snap"
    proc = _spawn(f"""
        import numpy as np
        import vettore_tpu as vt

        rng = np.random.default_rng(11)
        col = vt.Collection(name="crash2", dimensions=16, metric="l2",
                            index="flat")
        vecs = rng.normal(size=(128, 16)).astype(np.float32)
        rows = [{{"id": f"doc-{{i:03d}}", "vector": [float(v) for v in vecs[i]]}}
                for i in range(128)]
        col.put_many(rows[:50])
        col.snapshot({str(snap)!r})
        print("CHECKPOINTED", flush=True)
        while True:  # keep ingesting/deleting until killed
            col.put_many(rows[50:])
            for r in rows[50:]:
                col.delete(r["id"])
            print("CYCLE", flush=True)
    """)
    try:
        _wait_for(proc, "CHECKPOINTED")
        _wait_for(proc, "CYCLE")  # mid-mutation churn is in flight
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(128, 16)).astype(np.float32)
    col = vt.load_snapshot(str(snap))
    assert len(col.all()) == 50  # exactly the checkpointed state
    # re-drive the lost tail; the rebuilt collection reaches the final state
    col.put_many([{"id": f"doc-{i:03d}", "vector": [float(v) for v in vecs[i]]}
                  for i in range(50, 128)])
    res = col.search([float(v) for v in vecs[100]], limit=1)
    assert res[0].id == "doc-100"
    col.close()
