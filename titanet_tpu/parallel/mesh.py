"""Mesh construction and sharding specs.

The reference is single-process/single-device (SURVEY.md §2.3: no DP/TP/PP,
no distributed backend). Here the training step is data-parallel over a
``jax.sharding.Mesh``:

- the batch is sharded over the ``data`` axis (one shard per chip, fed over
  ICI by XLA-inserted collectives),
- params/optimizer state are replicated,
- gradients are globally averaged by XLA (GSPMD inserts the psum — the NCCL
  all-reduce equivalent, riding ICI),
- BatchNorm statistics are computed on the GLOBAL logical batch under jit
  semantics, so multi-chip training is bit-consistent with the reference's
  single-device global-batch BN — SyncBN for free, no divergence between
  1-chip and N-chip runs.

TP/PP/SP are intentionally out of scope: TitaNet is 6.4-25.3M params with
seconds-long inputs; every model fits comfortably in one chip's HBM
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch (dict of arrays) with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
