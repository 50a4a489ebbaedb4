"""Line-coverage gate for ``vettore_tpu/`` built on ``sys.monitoring``
(PEP 669) — this image ships no coverage.py, and the reference enforces
coverage in CI (Elixir ≥98%: mix.exs:15; Rust ≥98%: ci.yml:139), so the gate
is first-party.

Strategy (the same one coverage.py's sysmon core uses):

* a global ``PY_START`` hook fires once per code object (it returns
  ``DISABLE`` so each is seen exactly once); code objects under the package
  get per-code ``LINE`` events enabled;
* the ``LINE`` hook records (file, line) and returns ``DISABLE`` — every
  source location costs exactly one callback for the whole session, so the
  suite runs at essentially full speed;
* the executable-line universe comes from compiling each source file and
  walking its code objects' ``co_lines()`` — the same notion of "line" the
  monitor reports. ``# pragma: no cover`` excludes a line.

Usage: ``pytest -p tools.cov_plugin`` (the Makefile's ``cov`` target).
Under pytest-xdist each worker dumps its hit-set; the controller merges.
Gate: total coverage must be ≥ ``VETTORE_COV_MIN`` (default 90).
"""

from __future__ import annotations

import json
import os
import sys
import types
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "vettore_tpu"
PKG_PREFIX = str(PKG) + os.sep
TOOL = sys.monitoring.COVERAGE_ID
COV_DIR = ROOT / ".covdata"

_hits: dict[str, set[int]] = {}


def _on_start(code, _offset):
    if code.co_filename.startswith(PKG_PREFIX):
        sys.monitoring.set_local_events(
            TOOL, code, sys.monitoring.events.LINE
        )
    return sys.monitoring.DISABLE


def _on_line(code, line):
    _hits.setdefault(code.co_filename, set()).add(line)
    return sys.monitoring.DISABLE


def _start():
    sys.monitoring.use_tool_id(TOOL, "vettore-cov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.PY_START, _on_start
    )
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.PY_START)


def _executable_lines(path: Path) -> set[int]:
    src = path.read_text()
    excluded = {
        i
        for i, text in enumerate(src.splitlines(), 1)
        if "pragma: no cover" in text
    }
    try:
        top = compile(src, str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        skip_all = code.co_firstlineno in excluded  # pragma on the def line
        for _s, _e, line in code.co_lines():
            # line 0 entries (module epilogue artifacts) can never be
            # reported by the LINE monitor — excluding them keeps the
            # universe honest
            if line and not skip_all and line not in excluded:
                lines.add(line)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return lines


# -- pytest hooks -----------------------------------------------------------


def pytest_configure(config):
    if getattr(config, "workerinput", None) is None:
        COV_DIR.mkdir(exist_ok=True)
        # VETTORE_COV_APPEND: keep prior dumps so the gate can merge across
        # SEPARATE pytest invocations (one ~90-minute process accumulates
        # state that segfaults XLA's CPU compiler on the late mesh-HNSW
        # builds; two shorter processes do not)
        if not os.environ.get("VETTORE_COV_APPEND"):
            for old in COV_DIR.glob("*.json"):
                old.unlink()
    _start()


def pytest_sessionfinish(session, exitstatus):
    sys.monitoring.set_events(TOOL, 0)
    config = session.config
    worker = getattr(config, "workerinput", {})
    payload = {f: sorted(ls) for f, ls in _hits.items()}
    if worker:  # xdist worker: dump and let the controller merge
        name = worker.get("workerid", f"pid{os.getpid()}")
        (COV_DIR / f"{name}.json").write_text(json.dumps(payload))
        return
    # pid-unique so sequential append-mode invocations don't clobber each
    # other's dumps; the merge below reads every dump present
    (COV_DIR / f"controller-{os.getpid()}.json").write_text(json.dumps(payload))
    merged: dict[str, set[int]] = {}
    for shard in COV_DIR.glob("*.json"):
        if shard.name == "summary.json":  # pass-1's report, not a hit dump
            continue
        for f, ls in json.loads(shard.read_text()).items():
            merged.setdefault(f, set()).update(ls)

    rows = []
    tot_exec = tot_hit = 0
    for path in sorted(PKG.rglob("*.py")):
        exe = _executable_lines(path)
        if not exe:
            continue
        hit = merged.get(str(path), set()) & exe
        tot_exec += len(exe)
        tot_hit += len(hit)
        rows.append((str(path.relative_to(ROOT)), len(hit), len(exe)))

    pct = 100.0 * tot_hit / max(tot_exec, 1)
    gate = float(os.environ.get("VETTORE_COV_MIN", "90"))
    tw = config.get_terminal_writer()
    tw.sep("-", f"vettore_tpu line coverage: {pct:.2f}% (gate {gate:.0f}%)")
    for rel, h, e in rows:
        mark = "" if h / e >= gate / 100 else "  <-- below gate"
        tw.line(f"{rel:58s} {h:5d}/{e:<5d} {100.0 * h / e:5.1f}%{mark}")
    (ROOT / ".covdata" / "summary.json").write_text(json.dumps({
        "total_pct": round(pct, 2),
        "files": {r: round(100.0 * h / e, 2) for r, h, e in rows},
    }))
    if pct < gate:
        tw.line(f"COVERAGE GATE FAILED: {pct:.2f}% < {gate:.0f}%")
        session.exitstatus = 1
