"""Shared benchmark plumbing for the bench_*.py scripts.

One definition of the remote-TPU relay's fixed dispatch+readback floor
measurement (BENCHMARKS.md methodology): a synced call costs ~25-29 ms
regardless of device work, so every chained timing subtracts this floor.
"""

import time

import numpy as np


def measure_rtt_floor(samples: int = 5):
    """Median wall time of a trivial synced jitted call (seconds)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda z: (z * 1.000001).sum())
    z0 = jnp.ones((8, 128), jnp.float32)
    float(tiny(z0))  # compile
    ts = []
    for t in range(samples):
        zt = z0 + np.float32(t + 1)
        jax.block_until_ready(zt)
        t0 = time.perf_counter()
        float(tiny(zt))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
