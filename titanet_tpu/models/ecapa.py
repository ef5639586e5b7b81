"""ECAPA-TDNN (Desplanques et al., Interspeech 2020, arXiv:2005.07143).

A second flagship model family beyond the reference repo (which ships
TitaNet + a d-vector baseline only — /root/reference/src/models.py): the
de-facto standard speaker-embedding architecture, built TPU-first in the
same channels-last ``[B, T, C]`` conventions and from the same op set as
TitaNet (``SamePadConv1d``, torch-exact ``BatchNorm`` with deferred-EMA
moments, ``SqueezeExcitation``, masked length-aware statistics), so it
drops into ``train_step`` / ``embed_step`` / ``run_verification``
unchanged.

Structure:

  layer1   Conv(n_mels -> C, k=5) -> ReLU -> BN
  layer2-4 SE-Res2Block(C, k=3, dilation 2/3/4, scale=8):
             1x1 Conv -> ReLU -> BN
             Res2Net dilated conv (hierarchical group convs) -> ReLU -> BN
             1x1 Conv -> ReLU -> BN
             SE, then + residual
  MFA      concat(layer2..4 outputs) [B, T, 3C] -> 1x1 Conv -> ReLU -> [B, T, 1536]
  pooling  channel- and context-dependent attentive stats
           (attention sees [x, mean_t(x), std_t(x)]) -> [B, 3072] -> BN
  head     Linear(3072 -> E) -> BN

Differences from the paper's torch implementation, by design:

- SE reuses :class:`titanet_tpu.ops.se.SqueezeExcitation` (bias-free FCs,
  reference-parity module) with the bottleneck width set to the paper's
  fixed 128 via ``reduction = C // 128``,
- all statistics accept an optional frame ``mask`` so a padded batched
  embedding equals the utterance's solo embedding (``masked=True``
  verification protocol), which the paper's implementation lacks,
- BatchNorm is the explicit-state torch-exact module shared with TitaNet
  (cross-device ``axis_name`` SyncBN, deferred-EMA ``batch_moments``).

Parameter counts: C=512 -> ~6.2M, C=1024 -> ~14.7M (paper Table 1 scale).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import SamePadConv1d, torch_conv_init
from titanet_tpu.ops.norm import BatchNorm
from titanet_tpu.ops.pooling import attentive_stats
from titanet_tpu.ops.se import SqueezeExcitation


def _zero_padded(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero activations at padded frames. Conv bias + BN shift make pad
    positions nonzero, and the next conv's receptive field would read them
    — zeroing keeps a masked padded batch bit-consistent with the solo
    forward (whose same-padding IS zeros), so ``masked=True`` verification
    embeddings are length-exact."""
    if mask is None:
        return x
    return x * mask[..., None].astype(x.dtype)


class ConvReluBn(nn.Module):
    """Conv -> ReLU -> BN (ECAPA block ordering; TitaNet's ConvBlock1d is
    conv -> BN -> ReLU, so this is a distinct primitive)."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        x = SamePadConv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )(x, mask=mask if train else None)
        return _zero_padded(x, mask)


class Res2DilatedConv(nn.Module):
    """Res2Net hierarchical dilated convolution (Gao et al., arXiv:1904.01169
    §3, as used by ECAPA): split C into ``scale`` groups of width C/scale;
    y_1 = x_1, y_2 = K_2(x_2), y_i = K_i(x_i + y_{i-1}) — multi-scale
    receptive fields at ~1/scale the parameters of a dense KxC conv.

    The loop over ``scale`` groups is a static Python loop (8 iterations)
    over static channel slices: XLA sees ``scale - 1`` small independent
    conv GEMMs chained by adds, no dynamic shapes.
    """

    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        ch = x.shape[-1]
        assert ch % self.scale == 0, "channels must divide res2net scale"
        width = ch // self.scale
        outs = [x[..., :width]]  # y_1 = x_1 (identity branch)
        prev = None
        for i in range(1, self.scale):
            xi = x[..., i * width:(i + 1) * width]
            if prev is not None:
                xi = xi + prev
            # zero pad positions of the hierarchical carry: conv bias makes
            # them nonzero and conv_{i} would read them (see _zero_padded)
            prev = _zero_padded(
                SamePadConv1d(
                    features=width,
                    kernel_size=self.kernel_size,
                    dilation=self.dilation,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv_{i}",
                )(xi),
                mask,
            )
            outs.append(prev)
        return jnp.concatenate(outs, axis=-1)


class SERes2Block(nn.Module):
    """1x1 ConvReluBn -> Res2 dilated conv -> ReLU -> BN -> 1x1 ConvReluBn
    -> SE, plus identity residual (arXiv:2005.07143 fig. 2)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    se_bottleneck: int = 128
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        common = dict(
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        y = ConvReluBn(self.features, kernel_size=1, name="conv_in", **common)(
            x, train=train, mask=mask
        )
        y = Res2DilatedConv(
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            scale=self.scale,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="res2",
        )(y, mask=mask)
        y = nn.relu(y)
        y = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="res2_norm",
        )(y, mask=mask if train else None)
        y = _zero_padded(y, mask)
        y = ConvReluBn(self.features, kernel_size=1, name="conv_out", **common)(
            y, train=train, mask=mask
        )
        y = SqueezeExcitation(
            reduction=max(1, self.features // self.se_bottleneck),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="se",
        )(y, mask=mask)
        return x + y


class ChannelContextAttentivePooling(nn.Module):
    """ECAPA's attentive statistics pooling (arXiv:2005.07143 §3.3):
    channel-dependent attention whose scorer also sees the utterance's
    global context (per-channel mean and std over time).

      context  = [x, mean_t(x), std_t(x)]          [B, T, 3C]
      energies = W2 tanh(W1 context + b1) + b2     [B, T, C]
      out      = attentive mean/std with per-channel alphas  [B, 2C]

    Reuses :func:`titanet_tpu.ops.pooling.attentive_stats` (masked softmax
    + weighted moments).

    TPU formulation: the ``[B, T, 3C]`` context is never materialized.
    Splitting ``W1 = [W1x; W1m; W1s]`` row-wise, the mean/std terms are
    frame-INDEPENDENT, so

      W1 context + b1 = x @ W1x + (mean @ W1m + std @ W1s + b1)

    — one ``[B*T, C] @ [C, H]`` MXU matmul plus a ``[B, 1, H]`` bias,
    instead of a broadcast-concat (3x the layer's HBM traffic at
    B=128/T=301/C=1536: ~355 MB/step) feeding a 3x-wider GEMM. Identical
    math and parameter tree (``in_linear/{kernel [3C, H], bias}``).
    """

    hidden_size: int = 128
    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        ch = x.shape[-1]
        xf = x.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(xf * m, axis=1, keepdims=True) / n
            var = jnp.sum((xf - mean) ** 2 * m, axis=1, keepdims=True) / n
        else:
            mean = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.var(xf, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.clip(var, min=self.eps))
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        from titanet_tpu.ops.pooling import _DenseParams

        w1, b1 = _DenseParams(3 * ch, self.hidden_size, self.param_dtype,
                              name="in_linear")()
        w1 = w1.astype(dt)
        # frame-independent context contribution: a [B, 1, H] bias
        ctx_bias = (
            jnp.dot(mean.astype(dt), w1[ch:2 * ch])
            + jnp.dot(std.astype(dt), w1[2 * ch:])
            + b1.astype(dt)
        )
        e = jnp.tanh(jnp.dot(x.astype(dt), w1[:ch]) + ctx_bias)
        e = nn.Dense(
            ch,
            kernel_init=torch_conv_init(self.hidden_size),
            bias_init=torch_conv_init(self.hidden_size),
            dtype=dt,
            param_dtype=self.param_dtype,
            name="out_linear",
        )(e)
        return attentive_stats(x, e, mask=mask, eps=self.eps)


class EcapaTdnn(nn.Module):
    """Full ECAPA-TDNN: mel ``[B, T, n_mels]`` -> raw embedding ``[B, E]``.

    Same calling convention as :class:`titanet_tpu.models.TitaNet`
    (``train`` static flag, optional frame ``mask``, explicit
    ``batch_stats``/``batch_moments`` state), so every train/eval/serving
    path in the package drives it unchanged. Use
    :func:`titanet_tpu.models.l2_normalize` for unit-norm embeddings.
    """

    channels: int = 512
    mfa_channels: int = 1536
    embedding_size: int = 192
    kernel_size: int = 3
    dilations: tuple = (2, 3, 4)
    scale: int = 8
    se_bottleneck: int = 128
    attention_hidden_size: int = 128
    prolog_kernel_size: int = 5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,  # API-compat (no dropout here)
    ) -> jax.Array:
        del drop_pool
        common = dict(
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = ConvReluBn(
            self.channels, kernel_size=self.prolog_kernel_size, name="layer1",
            **common,
        )(_zero_padded(x, mask), train=train, mask=mask)
        outs = []
        for i, dilation in enumerate(self.dilations):
            h = SERes2Block(
                self.channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                scale=self.scale,
                se_bottleneck=self.se_bottleneck,
                name=f"layer{i + 2}",
                **common,
            )(h, train=train, mask=mask)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)  # MFA [B, T, 3C]
        h = SamePadConv1d(
            features=self.mfa_channels,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mfa_conv",
        )(h)
        h = nn.relu(h)
        pooled = ChannelContextAttentivePooling(
            hidden_size=self.attention_hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pool",
        )(h, mask=mask)
        pooled = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pool_norm",
        )(pooled)
        emb = nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(2 * self.mfa_channels),
            bias_init=torch_conv_init(2 * self.mfa_channels),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear",
        )(pooled)
        return BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_norm",
        )(emb)


def get_ecapa(
    channels: int = 512,
    embedding_size: int = 192,
    n_mels: int = 80,  # noqa: ARG001 — input width is shape-inferred
    attention_hidden_size: int = 128,
    dtype: Optional[jnp.dtype] = None,
    axis_name: Optional[str] = None,
) -> EcapaTdnn:
    """Preset constructor (paper scales: channels 512 ~6.2M params,
    1024 ~14.7M)."""
    return EcapaTdnn(
        channels=channels,
        embedding_size=embedding_size,
        attention_hidden_size=attention_hidden_size,
        dtype=dtype,
        axis_name=axis_name,
    )
