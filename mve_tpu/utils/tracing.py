"""Profiling/tracing hooks (SURVEY §5: the reference prints WallTimer
spans; the TPU equivalent is the JAX profiler plus the same structured
per-stage reports).

Set MVE_TPU_TRACE_DIR to capture an xprof trace of any `trace_stage`
block; without it, stages just report wall time through the callback.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional


@contextlib.contextmanager
def trace_stage(name: str, report: Optional[Callable[[str, float], None]] = None):
    """Time a pipeline stage; optionally capture a device profile."""
    trace_dir = os.environ.get("MVE_TPU_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(os.path.join(trace_dir, name))
    t0 = time.perf_counter()
    with ctx:
        yield
    elapsed = time.perf_counter() - t0
    if report is not None:
        report(name, elapsed)
    elif os.environ.get("MVE_TPU_TRACE_VERBOSE"):
        print(f"[trace] {name}: {elapsed * 1000:.1f}ms")
