"""x-vector (Snyder et al., ICASSP 2018) — the classic TDNN speaker
embedding, third model family beyond the reference repo.

Same channels-last conventions and op set as TitaNet/ECAPA (shared
``ConvReluBn`` block, torch-exact BatchNorm with deferred-EMA moments,
masked length-exact statistics), so it drives ``train_step`` /
``embed_step`` / ``run_verification`` / the CLI unchanged.

Structure (paper Table 1; dilations via same-pad convs):

  frame1  TDNN(k=5, d=1) -> H        frame4  1x1 -> H
  frame2  TDNN(k=3, d=2) -> H        frame5  1x1 -> P (1500)
  frame3  TDNN(k=3, d=3) -> H
  stats pooling: [mean_t, std_t]  -> [B, 2P]
  segment6 affine -> E  (the "x-vector"; extracted PRE-activation, as in
  Kaldi's standard recipe — segment7 and the softmax belong to the
  classification side, which lives in ``titanet_tpu.losses`` heads here)

H=512, P=1500, E=512 gives the paper-scale ~4.4M params; the default
E follows ``embedding_size`` so the whole eval stack (192-dim heads,
verification, diarization) applies unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.models.ecapa import ConvReluBn, _zero_padded
from titanet_tpu.ops.conv import torch_conv_init


def stats_pool(x: jax.Array, mask: Optional[jax.Array] = None,
               eps: float = 1e-6) -> jax.Array:
    """Mean + std over time, mask-aware: ``[B, T, C] -> [B, 2C]``."""
    xf = x.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(xf * m, axis=1) / n
        var = jnp.sum((xf - mean[:, None, :]) ** 2 * m, axis=1) / n
    else:
        mean = jnp.mean(xf, axis=1)
        var = jnp.var(xf, axis=1)
    std = jnp.sqrt(jnp.clip(var, min=eps))
    return jnp.concatenate([mean, std], axis=-1).astype(x.dtype)


class XVector(nn.Module):
    """mel ``[B, T, n_mels]`` -> raw x-vector ``[B, E]``."""

    hidden_size: int = 512
    frame_out: int = 1500
    embedding_size: int = 192
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,  # API-compat (no dropout)
    ) -> jax.Array:
        del drop_pool
        common = dict(
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = _zero_padded(x, mask)
        for name, k, dil, feat in (
            ("frame1", 5, 1, self.hidden_size),
            ("frame2", 3, 2, self.hidden_size),
            ("frame3", 3, 3, self.hidden_size),
            ("frame4", 1, 1, self.hidden_size),
            ("frame5", 1, 1, self.frame_out),
        ):
            h = ConvReluBn(feat, kernel_size=k, dilation=dil, name=name,
                           **common)(h, train=train, mask=mask)
        pooled = stats_pool(h, mask=mask)
        return nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(2 * self.frame_out),
            bias_init=torch_conv_init(2 * self.frame_out),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="segment6",
        )(pooled)


def get_xvector(
    hidden_size: int = 512,
    frame_out: int = 1500,
    embedding_size: int = 192,
    dtype: Optional[jnp.dtype] = None,
    axis_name: Optional[str] = None,
) -> XVector:
    return XVector(
        hidden_size=hidden_size,
        frame_out=frame_out,
        embedding_size=embedding_size,
        dtype=dtype,
        axis_name=axis_name,
    )
