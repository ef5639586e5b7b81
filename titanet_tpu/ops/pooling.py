"""Attentive statistics pooling (Okabe et al., arXiv:1803.10963).

Rebuild of the reference ``AttentiveStatsPooling``
(``/root/reference/src/models.py:532-584``) in channels-last layout:

  energies = W2 tanh(W1 x + b1) + b2          # per-frame, per-channel
  alphas   = softmax(energies, axis=time)
  mean     = sum_t alphas * x
  std      = sqrt(clamp(sum_t alphas * x^2 - mean^2, eps))
  out      = concat([mean, std])              # [B, 2C]

The two projections are ``[B*T, C] @ [C, H]`` and ``[B*T, H] @ [H, C]``
matmuls (MXU); softmax + weighted moments are a single fused VPU epilogue
under XLA (profiled: XLA already emits one fused reduction kernel here, so
no hand-written Pallas variant exists — see BENCHMARKS.md roofline notes).

Pass ``mask`` (``[B, T]``, 1 = valid) to exclude padded frames from the
softmax — the reference cannot do this (it attends over padding); parity mode
is mask=None.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import torch_conv_init


def attentive_stats(
    x: jax.Array,
    energies: jax.Array,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Softmax over time + weighted mean/std. x, energies: [B, T, C]."""
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(energies.dtype).min, energies.dtype)
        energies = jnp.where(mask[..., None].astype(bool), energies, neg)
    alphas = jax.nn.softmax(energies.astype(jnp.float32), axis=1)
    xf = x.astype(jnp.float32)
    means = jnp.sum(alphas * xf, axis=1)
    residuals = jnp.sum(alphas * xf**2, axis=1) - means**2
    stds = jnp.sqrt(jnp.clip(residuals, min=eps))
    return jnp.concatenate([means, stds], axis=-1).astype(x.dtype)


class AttentiveStatsPooling(nn.Module):
    hidden_size: int = 128
    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        ch = x.shape[-1]
        e = nn.Dense(
            self.hidden_size,
            kernel_init=torch_conv_init(ch),
            bias_init=torch_conv_init(ch),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="in_linear",
        )(x)
        e = jnp.tanh(e)
        e = nn.Dense(
            ch,
            kernel_init=torch_conv_init(self.hidden_size),
            bias_init=torch_conv_init(self.hidden_size),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_linear",
        )(e)
        return attentive_stats(x, e, mask=mask, eps=self.eps)


class SimplePooling(nn.Module):
    """Average pool + linear, the reference's ``simple_pool`` alternative
    (src/models.py:497-502): AdaptiveAvgPool1d -> Linear(C -> 2C)."""

    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        ch = x.shape[-1]
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), jnp.asarray(1.0, x.dtype)
            )
        else:
            pooled = jnp.mean(x, axis=1)
        return nn.Dense(
            ch * 2,
            kernel_init=torch_conv_init(ch),
            bias_init=torch_conv_init(ch),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear",
        )(pooled)
