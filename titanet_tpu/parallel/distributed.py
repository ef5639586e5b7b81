"""Multi-process (multi-host) runtime initialization.

The reference is strictly single-process (SURVEY.md §2.3: no
torch.distributed anywhere); this module is the rebuild's upgrade path to
multi-host data parallelism:

- every process calls :func:`maybe_initialize_distributed` BEFORE touching
  devices (the CLI does, ``titanet_tpu.cli.main``),
- the global mesh then spans all hosts' devices; the loader gives each
  process a disjoint round-robin slice of the epoch's batches
  (``DataLoader(shard_id=jax.process_index(), ...)``) — the logical global
  batch of one step is the CONCATENATION of the per-process batches, so
  global batch size = ``P * batch_size``,
- :func:`global_batch_array` assembles each host's local batch into the
  global jax.Array (``jax.make_array_from_process_local_data``); under jit
  the gradient all-reduce and global-batch BatchNorm statistics follow from
  GSPMD semantics — a P-process run computes bit-the-same step as one
  process fed the concatenated batch (asserted by
  ``tests/test_multiprocess.py``).

Environment contract (set per process by the launcher):

- ``TITANET_COORDINATOR``   host:port of process 0 (e.g. ``localhost:9911``)
- ``TITANET_NUM_PROCESSES`` total process count
- ``TITANET_PROCESS_ID``    this process's rank
- ``TITANET_DISTRIBUTED=auto`` instead of the three above on environments
  where JAX can self-discover (Cloud TPU pods, SLURM).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize the JAX distributed runtime from the environment.

    Returns True if a multi-process runtime was (or already is) live.
    No-op when the env contract is absent — single-process behavior is
    unchanged, matching the reference.
    """
    # NOTE: don't touch jax.process_count()/devices() before initialize —
    # any backend query locks the runtime into single-process mode.
    coordinator = os.environ.get("TITANET_COORDINATOR")
    auto = os.environ.get("TITANET_DISTRIBUTED", "").lower() == "auto"
    if not coordinator and not auto:
        return jax.process_count() > 1  # maybe a launcher initialized it
    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(os.environ["TITANET_NUM_PROCESSES"]),
                process_id=int(os.environ["TITANET_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
    except RuntimeError as exc:
        if "already" not in str(exc):
            raise
        # initialized earlier (idempotent re-entry)
    if verbose:
        print(
            f"[distributed] process {jax.process_index()}/{jax.process_count()}"
            f" up; {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True


def global_batch_array(sharding, host_array) -> jax.Array:
    """Assemble one step's GLOBAL batch from this process's local batch.

    ``sharding`` is the batch NamedSharding over the global mesh; the
    returned array's global shape has leading dim ``P * local_batch``.
    Single-process: plain device_put (identical to the old path).
    """
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(host_array)
    )
