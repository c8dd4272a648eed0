"""Lightweight tracing/observability for the codec pipelines.

The reference narrates progress via unconditional couts and has no
timers (SURVEY.md §5); here diagnostics are structured and opt-in:

  * ``timed(name)`` — context manager accumulating wall-time per stage
    into a process-wide registry (`get_timings()`), enabled cheaply
    always;
  * ``verbose()`` — True when WR_VERBOSE=1; callers gate their
    reference-style per-layer prints on it.

The bench and CLI tools surface the per-stage breakdown with
WR_VERBOSE=1.
"""
from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

_timings: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _timings[name] += dt
        _counts[name] += 1
        if verbose():
            print(f"[wr] {name}: {dt:.3f}s", flush=True)


def get_timings() -> Dict[str, dict]:
    return {k: {"total_s": _timings[k], "count": _counts[k]}
            for k in _timings}


def reset_timings() -> None:
    _timings.clear()
    _counts.clear()


def verbose() -> bool:
    return os.environ.get("WR_VERBOSE") == "1"
