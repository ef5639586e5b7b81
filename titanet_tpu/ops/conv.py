"""1D convolution primitives in channels-last ``[B, T, C]`` layout.

TPU-first rebuild of the reference primitives in
``/root/reference/src/modules.py``:

- ``SamePadConv1d`` — same-padding conv compatible with stride/dilation,
  matching the reference's on-the-fly padding formula
  (``src/modules.py:30-35``) so sequence length is preserved for stride 1.
- ``DepthwiseSeparableConv1d`` — grouped K-tap conv + 1x1 pointwise
  (``src/modules.py:43-93``). The pointwise conv is expressed as a plain
  matmul so XLA tiles it directly onto the MXU.

Layout rationale: the reference uses torch's ``[B, C, T]``; on TPU the last
dimension maps to the 128-wide lane dimension, so we keep channels last —
pointwise convs become ``[B*T, C] @ [C, F]`` matmuls and depthwise convs
vectorize across channels on the VPU.

Parameter initialization reproduces torch's Conv1d defaults
(kaiming_uniform with a=sqrt(5) => U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
so training dynamics match the reference.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _dw_bwd_mode() -> str:
    """Depthwise-backward routing: 'xla' (default) or 'pallas' (the fused
    single-pass gradient kernel, ops/pallas/dwconv.py). The full-step A/B
    is CLOSED: Pallas measured 40.1 ms/step vs XLA's 25.4 at B=128 (TPU
    v5e, same day) — XLA's grouped-conv gradients win; the kernel stays
    opt-in for study only. See BENCHMARKS.md train-step ledger."""
    return os.environ.get("TITANET_DW_BWD", "xla")


def same_padding(length: int, kernel_size: int, stride: int, dilation: int) -> int:
    """Reference padding formula (src/modules.py:30-35), applied to both sides."""
    return (
        stride * (length - 1) - length + kernel_size + (dilation - 1) * (kernel_size - 1)
    ) // 2


def torch_conv_init(fan_in: int):
    """torch.nn.Conv1d/Linear default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv1d_same(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Functional same-padded 1D conv.

    Args:
      x: ``[B, T, C_in]``.
      kernel: ``[K, C_in // groups, C_out]`` (WIO layout).
      bias: optional ``[C_out]``.

    Returns ``[B, T_out, C_out]`` with ``T_out == T`` for stride 1 / odd K.
    """
    k = kernel.shape[0]
    pad = same_padding(x.shape[1], k, stride, dilation)
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _shift_t(v: jax.Array, s: int) -> jax.Array:
    """``out[:, t] = v[:, t + s]`` with zero fill off the edges."""
    if s == 0:
        return v
    if s > 0:
        return jnp.pad(v[:, s:, :], ((0, 0), (0, s), (0, 0)))
    return jnp.pad(v[:, :s, :], ((0, 0), (-s, 0), (0, 0)))


@jax.custom_vjp
def depthwise_conv1d_same(x: jax.Array, kernel: jax.Array, bias: jax.Array):
    """Stride-1 depthwise conv (``groups == C``), K odd, same padding.

    Forward is the plain grouped ``conv_general_dilated`` — XLA's
    conv+BN+relu fusion chains stay intact (swapping the forward for
    shifted adds measured -24% in the full step, BENCHMARKS.md). Only the
    BACKWARD is replaced: XLA's grouped-conv gradients cost ~3.6 ms of a
    27 ms TitaNet-S step (profile_train.py) while the actual math is K
    shifted multiply-adds (dx) and K shifted multiply-reduces (dW) — pure
    VPU work that fuses with the surrounding elementwise gradient ops.
    """
    return conv1d_same(x, kernel, bias, groups=x.shape[-1])


def _dw_fwd(x, kernel, bias):
    return depthwise_conv1d_same(x, kernel, bias), (x, kernel)


def _dw_bwd(res, dy):
    x, kernel = res
    k = kernel.shape[0]
    pad = (k - 1) // 2
    w = kernel[:, 0, :]  # [K, C]
    dyf = dy
    dx = None
    for i in range(k):
        term = _shift_t(dyf, pad - i) * w[i][None, None, :].astype(dy.dtype)
        dx = term if dx is None else dx + term
    dk = jnp.stack(
        [
            jnp.sum(
                (_shift_t(x, i - pad) * dyf).astype(jnp.float32), axis=(0, 1)
            )
            for i in range(k)
        ]
    )[:, None, :]  # [K, 1, C]
    db = jnp.sum(dyf.astype(jnp.float32), axis=(0, 1))
    return dx.astype(x.dtype), dk.astype(kernel.dtype), db


depthwise_conv1d_same.defvjp(_dw_fwd, _dw_bwd)


class SamePadConv1d(nn.Module):
    """Same-padding 1D convolution (reference ``Conv1dSamePadding``,
    src/modules.py:5-40), channels-last."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0, "channels must divide groups"
        fan_in = (in_ch // self.groups) * self.kernel_size
        kernel = self.param(
            "kernel",
            torch_conv_init(fan_in),
            (self.kernel_size, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", torch_conv_init(fan_in), (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.kernel_size == 1 and self.stride == 1 and self.groups == 1:
            # Pointwise conv as a direct matmul — MXU fast path.
            out = jnp.einsum(
                "btc,cf->btf",
                x,
                kernel[0].astype(x.dtype),
                preferred_element_type=x.dtype,
            )
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        if (
            self.groups == in_ch
            and self.features == in_ch
            and self.stride == 1
            and self.dilation == 1
            and self.use_bias
            and _dw_bwd_mode() == "pallas"
        ):
            from titanet_tpu.ops.pallas.dwconv import (
                depthwise_conv1d_fused_bwd,
                kernel_supports,
            )

            if kernel_supports(x.shape[1], in_ch, self.kernel_size, x.dtype):
                return depthwise_conv1d_fused_bwd(x, kernel, bias)
        # NOTE: two recorded negative results keep the grouped conv as-is.
        # (1) depthwise FORWARD as K shifted multiply-adds: faster in
        # isolation (0.013 vs 0.046 ms) but -24% in the full step (breaks
        # XLA's conv+BN+relu fusion chains). (2) depthwise BACKWARD as
        # shifted adds via custom VJP (depthwise_conv1d_same below): the
        # K per-tap f32 multiply-reduces materialize [B,T,C] temps and
        # measured 32.6 vs 26.7 ms/step at B=128 — XLA's grouped conv
        # gradients are already near their bandwidth envelope.
        return conv1d_same(
            x, kernel, bias, stride=self.stride, dilation=self.dilation, groups=self.groups
        )


class DepthwiseSeparableConv1d(nn.Module):
    """Depthwise (grouped, K-tap) conv followed by a pointwise 1x1 conv.

    Mirrors reference ``DepthwiseConv1d`` (src/modules.py:43-93): the
    depthwise stage keeps channel count, the pointwise stage maps to
    ``features`` output channels. Both stages carry a bias, as in torch.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        x = SamePadConv1d(
            features=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=in_ch,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depthwise",
        )(x)
        x = SamePadConv1d(
            features=self.features,
            kernel_size=1,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pointwise",
        )(x)
        return x
