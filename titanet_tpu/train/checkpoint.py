"""Orbax checkpointing with resume.

The reference only SAVES checkpoints (``/root/reference/src/learn.py:180-201``,
every 25 epochs + final) and has no resume path — loading happened manually
in the notebook. Here:

- :func:`save_checkpoint` writes the FULL train state (params incl. the
  classification head, batch_stats, optimizer state, step, PRNG key),
- :func:`restore_latest` resumes training exactly where it stopped,
- torch ``.pth`` checkpoints from the reference can be imported via
  :mod:`titanet_tpu.utils.torch_compat`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from titanet_tpu.train.state import TrainState


def _manager(path: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(path: str, epoch: int, state: TrainState) -> None:
    """Save the full train state under ``path/<epoch>`` (reference naming:
    ``epoch_N.pth``; orbax uses integer step dirs)."""
    mgr = _manager(path)
    mgr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(path: str, epoch: int, abstract_state: TrainState) -> TrainState:
    mgr = _manager(path)
    restored = mgr.restore(
        epoch, args=ocp.args.StandardRestore(abstract_state)
    )
    mgr.close()
    return restored


def restore_latest(path: str, abstract_state: TrainState):
    """-> (state, epoch) from the newest checkpoint, or (None, 0)."""
    step = latest_epoch(path)
    if step is None:
        return None, 0
    return restore_checkpoint(path, step, abstract_state), step
