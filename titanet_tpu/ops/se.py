"""Squeeze-and-Excitation for ``[B, T, C]`` sequences.

Rebuild of the reference SE module (``/root/reference/src/modules.py:151-189``):
global average pool over time -> FC(C -> C/r) -> ReLU -> FC(C/r -> C) ->
sigmoid -> channel-wise rescale. Both FCs are bias-free, as in the reference.

The time pool averages over *all* frames, including padding, to match the
reference's ``AdaptiveAvgPool1d(1)`` over zero-padded batches (pad-included
statistics, SURVEY.md §7). Pass ``mask`` for a length-aware pool.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import torch_conv_init


class SqueezeExcitation(nn.Module):
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        ch = x.shape[-1]
        hidden = ch // self.reduction
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            squeezed = jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), jnp.asarray(1.0, x.dtype)
            )
        else:
            squeezed = jnp.mean(x, axis=1)  # [B, C]
        e = nn.Dense(
            hidden,
            use_bias=False,
            kernel_init=torch_conv_init(ch),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc1",
        )(squeezed)
        e = nn.relu(e)
        e = nn.Dense(
            ch,
            use_bias=False,
            kernel_init=torch_conv_init(hidden),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc2",
        )(e)
        e = nn.sigmoid(e)
        return x * e[:, None, :].astype(x.dtype)
