"""Stage-span tracing (the reference's tracing/texray equivalent,
SURVEY.md §5: spans named stark/* wrap every prover stage).

Spans nest, record wall time, and stream one line per span exit when
MULTISTARK_TEXRAY is set (filter by comma-separated prefixes, default
"stark/").  `jax.profiler.TraceAnnotation` is attached when available so
device timelines carry the same taxonomy."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List

_STACK: List[str] = []
_TIMES: Dict[str, float] = {}
_COUNTS: Dict[str, int] = {}


def _enabled_prefixes():
    v = os.environ.get("MULTISTARK_TEXRAY")
    if v is None:
        return None
    return [p for p in (v.split(",") if v else ["stark/"]) if p] or ["stark/"]


@contextlib.contextmanager
def span(name: str):
    _STACK.append(name)
    try:
        import jax

        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if ann is not None:
            ann.__exit__(None, None, None)
        _STACK.pop()
        _TIMES[name] = _TIMES.get(name, 0.0) + dt
        _COUNTS[name] = _COUNTS.get(name, 0) + 1
        prefixes = _enabled_prefixes()
        if prefixes is not None and any(name.startswith(p) for p in prefixes):
            indent = "  " * len(_STACK)
            print(f"[texray] {indent}{name}: {dt * 1e3:.1f}ms", flush=True)


def span_times() -> Dict[str, float]:
    """Accumulated seconds per span name (for benches)."""
    return dict(_TIMES)


def reset_spans() -> None:
    _TIMES.clear()
    _COUNTS.clear()
