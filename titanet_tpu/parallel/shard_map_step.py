"""Explicit shard_map data-parallel training step.

The default multi-chip path is jit/GSPMD (titanet_tpu.train.state.train_step
with sharded inputs): XLA inserts the gradient all-reduce and computes
global-batch BN automatically. This module provides the EXPLICIT variant —
per-shard computation under ``jax.shard_map`` with hand-placed collectives:

- gradients averaged with ``lax.pmean`` over the data axis (the NCCL
  all-reduce equivalent, riding ICI),
- BatchNorm batch statistics psum-averaged across shards (SyncBN, via the
  ``axis_name`` support in titanet_tpu.ops.norm.BatchNorm), keeping N-chip
  training semantically identical to 1-chip (tested against the GSPMD path).

Use this when you want manual control over collective placement (e.g. to
overlap grad reduction with the backward pass, or per-shard loss scaling);
otherwise prefer the simpler GSPMD path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from titanet_tpu.losses.heads import renormalize_params
from titanet_tpu.ops.augment import spec_augment
from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
from titanet_tpu.train.state import TrainState


def make_shard_map_train_step(
    mesh: Mesh,
    *,
    model,
    head,
    optimizer,
    frontend: FrontendConfig,
    augment: Optional[tuple] = None,
    renorm_head: bool = False,
    axis_name: str = "data",
):
    """Build a jitted shard_map train step.

    ``model`` must be constructed with ``axis_name=axis_name`` so BatchNorm
    psum-averages its batch statistics (SyncBN).
    """

    def per_shard(state: TrainState, waveform, lengths, speakers):
        key, k_aug, k_drop = jax.random.split(state.key, 3)
        # decorrelate augment/dropout streams across shards
        shard = jax.lax.axis_index(axis_name)
        k_aug = jax.random.fold_in(k_aug, shard)
        k_drop = jax.random.fold_in(k_drop, shard)

        mel, mask = log_mel_spectrogram(waveform, frontend, lengths=lengths)
        if augment is not None:
            fr, fn, tr, tn, prob = augment
            mel = spec_augment(
                k_aug, mel, freq_mask_ratio=fr, freq_mask_num=fn,
                time_mask_ratio=tr, time_mask_num=tn, probability=prob,
                frames_mask=mask,
            )

        def loss_fn(params):
            emb, updates = model.apply(
                {"params": params["backbone"], "batch_stats": state.batch_stats},
                mel,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            _, preds, loss = head.apply({"params": params["head"]}, emb, speakers)
            return loss, (preds, updates["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # explicit collectives: average grads and loss across the mesh
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        # batch_stats were already psum-synced inside BatchNorm (axis_name)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if renorm_head:
            new_params = dict(new_params)
            new_params["head"] = renormalize_params(dict(new_params["head"]))
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            key=key,
        )
        return new_state, {"loss": loss, "preds": preds}

    state_spec = P()  # replicated
    data_spec = P(axis_name)
    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, data_spec),
        out_specs=(state_spec, {"loss": P(), "preds": data_spec}),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, NamedSharding(mesh, P()))
