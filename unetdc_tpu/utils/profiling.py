"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5, only tqdm bars).
Here every pipeline stage can be wrapped in `stage_timer`, producing a
per-stage wall-time report, and `--profile` on the CLIs writes a TensorBoard
trace via jax.profiler for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

_STAGE_TOTALS: Dict[str, float] = defaultdict(float)
_STAGE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage_timer(name: str):
    """Accumulate wall time per pipeline stage; also emits a
    jax.profiler.TraceAnnotation so the stage shows up in device traces."""
    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _STAGE_TOTALS[name] += dt
    _STAGE_COUNTS[name] += 1


def stage_report() -> str:
    lines = ["stage timings:"]
    for name in sorted(_STAGE_TOTALS, key=_STAGE_TOTALS.get, reverse=True):
        tot = _STAGE_TOTALS[name]
        n = _STAGE_COUNTS[name]
        lines.append(f"  {name:32s} {tot:8.3f}s total  "
                     f"{tot / max(n, 1) * 1000:8.1f}ms/call  x{n}")
    return "\n".join(lines)


def reset_stages():
    _STAGE_TOTALS.clear()
    _STAGE_COUNTS.clear()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
