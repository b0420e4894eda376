"""Stage-span tracing (the reference's tracing/texray equivalent,
SURVEY.md §5: spans named stark/* wrap every prover stage).

Spans nest, record wall time AND host-memory movement (texray
`.track_ram()` parity, reference benches/multi_stark.rs:44-67: each span
reports the RSS delta across the span and the high-water-mark rise that
happened inside it), and stream one line per span exit when
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
_MEM: Dict[str, Dict[str, float]] = {}

_PAGE_MIB = os.sysconf("SC_PAGE_SIZE") / (1024.0 * 1024.0)


def _rss_mib() -> float:
    """Current RSS in MiB (one /proc read; ~µs)."""
    try:
        with open("/proc/self/statm", "rb") as f:
            return int(f.read().split()[1]) * _PAGE_MIB
    except OSError:
        return 0.0


def _hwm_mib() -> float:
    """VmHWM (peak RSS) in MiB."""
    try:
        with open("/proc/self/status", "rb") as f:
            for line in f:
                if line.startswith(b"VmHWM:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


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
    rss0, hwm0 = _rss_mib(), _hwm_mib()
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
        rss1, hwm1 = _rss_mib(), _hwm_mib()
        m = _MEM.setdefault(name, {"rss_delta_mib": 0.0, "hwm_rise_mib": 0.0, "rss_mib": 0.0})
        m["rss_delta_mib"] += rss1 - rss0
        # high-water-mark rise during the span: transient allocations that
        # set a new process peak happened INSIDE this span (texray peak)
        m["hwm_rise_mib"] += max(0.0, hwm1 - hwm0)
        m["rss_mib"] = rss1
        prefixes = _enabled_prefixes()
        if prefixes is not None and any(name.startswith(p) for p in prefixes):
            indent = "  " * len(_STACK)
            print(
                f"[texray] {indent}{name}: {dt * 1e3:.1f}ms ── "
                f"RAM Δ {rss1 - rss0:+.0f}MiB peakΔ +{max(0.0, hwm1 - hwm0):.0f}MiB",
                flush=True,
            )


def span_times() -> Dict[str, float]:
    """Accumulated seconds per span name (for benches)."""
    return dict(_TIMES)


def span_memory() -> Dict[str, Dict[str, float]]:
    """Accumulated per-span host-memory movement: rss_delta_mib (RSS change
    across the span, summed over calls), hwm_rise_mib (process peak-RSS rise
    that occurred inside the span — attributes transient allocation spikes),
    rss_mib (RSS at last span exit)."""
    return {k: dict(v) for k, v in _MEM.items()}


def reset_spans() -> None:
    _TIMES.clear()
    _COUNTS.clear()
    _MEM.clear()
