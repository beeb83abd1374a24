"""Profiling hooks — jax.profiler integration.

The reference's only tracing is the TimeLogger ms table (SURVEY.md §5).
Here stage timing (utils.timing) is complemented by on-demand XLA traces:
wrap any pipeline section in ``trace(...)`` and open the dump in
TensorBoard / Perfetto to see per-kernel device time, HBM traffic and
fusion boundaries.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/reconstructor_trace", enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed block."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (shows up as a TraceMe)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
