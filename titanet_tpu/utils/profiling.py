"""Profiling and tracing.

The reference only had wall-clock segment timers (src/learn.py:85-135).
TPU equivalents here (SURVEY.md §5):

- :func:`trace` — jax.profiler trace capture (TensorBoard-compatible) around
  any code region,
- :func:`annotate` — named TraceAnnotation for device timelines,
- :class:`StepProfiler` — per-step host wall-time with
  ``block_until_ready`` fencing, for honest device step timing,
- :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Honest per-step timing: fences with block_until_ready so async
    dispatch doesn't hide device time."""

    def __init__(self):
        self.times: Dict[str, list] = {}

    @contextlib.contextmanager
    def step(self, name: str, result_to_fence=None):
        t0 = time.perf_counter()
        yield
        if result_to_fence is not None:
            jax.block_until_ready(result_to_fence)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        return {
            f"{k}_ms_median": float(np.median(v) * 1e3) for k, v in self.times.items()
        }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict:
    """Live HBM stats (bytes) for a device, when the backend exposes them."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return {}
