"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference, which
only logs wall-clock hours at run.py:301,312).

``trace_chunks`` wraps the training loop's chunk boundary with a
``jax.profiler`` trace so a TensorBoard-viewable device trace (XLA ops, TPU
step time, HBM usage) lands under ``<dir>/plugins/profile``.  Device memory
stats come from ``device_memory_profile`` / live-array accounting.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_chunks(log_dir: Optional[str]) -> Iterator[None]:
    """Profile everything inside the context when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named sub-span inside a trace (shows up on the TraceViewer)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_summary() -> dict:
    """Coarse live-memory stats per device (bytes)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
