"""Attentive statistics pooling (Okabe et al., arXiv:1803.10963).

Rebuild of the reference ``AttentiveStatsPooling``
(``/root/reference/src/models.py:532-584``) in channels-last layout:

  energies = W2 tanh(W1 x + b1) + b2          # per-frame, per-channel
  alphas   = softmax(energies, axis=time)
  mean     = sum_t alphas * x
  std      = sqrt(clamp(sum_t alphas * x^2 - mean^2, eps))
  out      = concat([mean, std])              # [B, 2C]

The two projections are ``[B*T, C] @ [C, H]`` and ``[B*T, H] @ [H, C]``
matmuls (MXU). On TPU with no mask the whole chain runs as ONE fused
Pallas kernel (:mod:`titanet_tpu.ops.pallas.pool`): the ``[B, T, C]``
energies tensor never exists in HBM and ``y`` is read exactly once
(region measured ~2.7 ms of a 27 ms train step under XLA at B=128,
profile_train.py). The jnp path below remains the parity reference, the
masked path, and the non-TPU fallback; parameters are declared at the
exact tree paths the previous ``nn.Dense`` children used, so checkpoints
and torch imports are unaffected.

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


class _DenseParams(nn.Module):
    """Declares ``kernel``/``bias`` at the exact tree path an ``nn.Dense``
    child of the same name would — flax derives param RNG from the path, so
    values are bit-identical too — while handing the raw arrays back to the
    parent (for the fused kernel or an explicit matmul)."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        init = torch_conv_init(self.in_features)
        kernel = self.param(
            "kernel", init, (self.in_features, self.features), self.param_dtype
        )
        bias = self.param("bias", init, (self.features,), self.param_dtype)
        return kernel, bias


class AttentiveStatsPooling(nn.Module):
    hidden_size: int = 128
    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    use_kernel: Optional[bool] = None  # None = auto (TPU, no mask, aligned)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        prescale: Optional[jax.Array] = None,
        preshift: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Pool ``x [B, T, C]``. With ``prescale``/``preshift`` (per-channel
        f32 fold vectors from an upstream BatchNorm in deferred-apply mode),
        ``relu(prescale*x + preshift)`` is applied first — inside the fused
        kernel when eligible, so the post-BN activation never exists in
        HBM."""
        ch = x.shape[-1]
        wa, ba = _DenseParams(ch, self.hidden_size, self.param_dtype,
                              name="in_linear")()
        wb, bb = _DenseParams(self.hidden_size, ch, self.param_dtype,
                              name="out_linear")()
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        fold = prescale is not None
        use_kernel = self.use_kernel
        if use_kernel is None:
            from titanet_tpu.ops.pallas.pool import kernel_supports

            use_kernel = (
                mask is None
                and x.ndim == 3
                and jax.default_backend() == "tpu"
                and kernel_supports(ch, self.hidden_size, x.shape[1], dt)
            )
        if use_kernel:
            from titanet_tpu.ops.pallas.pool import attentive_pool_fused

            zeros = jnp.zeros((ch,), jnp.float32)
            # batch tile scaled by T: per-row [T, C] VMEM temps dominate,
            # so keep bt*T roughly constant (eval sees unchunked, longer
            # utterances — a fixed bt=4 OOMs VMEM at T~600, measured)
            base = 4 if dt == jnp.bfloat16 else 2
            bt = max(1, min(base, (base * 310) // max(x.shape[1], 1)))
            return attentive_pool_fused(
                x.astype(dt),
                prescale if fold else zeros,
                preshift if fold else zeros,
                wa, ba, wb, bb, self.eps, bt, fold,
            )
        if fold:
            x = jax.nn.relu(
                x.astype(jnp.float32) * prescale + preshift
            ).astype(dt)
        # jnp path — identical math (and dtype promotion) to the previous
        # nn.Dense formulation; parity reference and masked/CPU fallback.
        e = jnp.dot(x.astype(dt), wa.astype(dt)) + ba.astype(dt)
        e = jnp.tanh(e)
        e = jnp.dot(e, wb.astype(dt)) + bb.astype(dt)
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
