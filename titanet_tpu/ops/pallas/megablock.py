"""Fused TitaNet mega-block sub-chain kernel (inference) — EXPERIMENTAL.

The encoder's hot loop is N mega-blocks of three depthwise-separable
ConvBlocks (reference src/models.py:407-472). This kernel keeps the entire
3-stage chain

    (dwconv k -> +bias -> pointwise matmul -> +bias -> BN-affine -> relu) x3

in VMEM: one activation read and one write per mega-block. BatchNorm (eval
mode) folds to a per-channel scale/shift. The depthwise conv is K shifted
multiply-adds on the VPU; the pointwise conv is a [BB*rows, C] @ [C, C] MXU
matmul.

MEASURED RESULT (v5e, TitaNet-S, B=128, T=301): numerically exact
(cosine drift ~1e-6 vs the flax path) but SLOWER than XLA — 11.5 ms/batch
vs XLA's 4.4-5.3 ms. XLA's automatic conv+BN+relu fusion and cross-op
pipelining already keep this model near its roofline; the hand-tiled kernel
loses pipelining across mega-blocks and spends VPU time on the shifted
depthwise accumulation. Kept as a correct, tested reference for future
tile-shape experiments; the DEFAULT inference path remains flax/XLA
(titanet_tpu.models.TitaNet.apply). The fully-fused mel frontend
(ops/pallas/melspec.py log_mel_spectrogram_pallas_fused), by contrast,
BEATS XLA's best wav->mel pipeline by 1.4x at serving precision — the
frontend is framing-layout-bound, where a kernel can cut HBM traffic and
pad-FLOPs in ways XLA's fuser cannot; the encoder is plain-GEMM-bound,
where it can't.

Tiling: grid (B, T blocks). Each block needs a halo of H = n_stages*(k-1)/2
rows per side (the chained convs' receptive field); overlapping windows are
staged as a [B, nT, window, C] tensor via strided slices (cheap, gather-free)
since BlockSpec tiles are disjoint. The H edge rows are the same-padding
zeros of the convolutions, added by ``jnp.pad`` — bit-identical semantics to
the reference's per-conv zero padding.

SE + skip + final relu stay in XLA (global-T reduction; cheap fused work).

VMEM budget: window*C activations x4 stages + 3 pointwise [C,C] weights —
comfortable for C in {256, 512} (TitaNet S/M) at f32; for C=1024 use bf16
activations or a smaller ``block_t``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm eval mode -> per-channel (scale', shift')."""
    inv = scale / jnp.sqrt(var + eps)
    return inv, bias - mean * inv


def _kernel(x_ref, dw_ref, dwb_ref, pw_ref, pwb_ref, bn_ref, out_ref, *,
            k: int, tb: int, n_stages: int):
    pad = (k - 1) // 2
    rows = tb + 2 * pad * n_stages
    h = x_ref[:, 0]  # [BB, window, C] — batch-tiled so the pointwise GEMM
    #                  sees BB*rows rows (MXU utilization)
    bb, _, c = h.shape
    for s in range(n_stages):
        rows -= 2 * pad
        acc = jnp.zeros((bb, rows, c), jnp.float32)
        for j in range(k):
            acc = acc + h[:, j : j + rows, :].astype(jnp.float32) * dw_ref[s, j][None, None, :]
        acc = acc + dwb_ref[s][None, None, :]
        acc = jnp.dot(
            acc.reshape(bb * rows, c).astype(x_ref.dtype),
            pw_ref[s],
            preferred_element_type=jnp.float32,
        ).reshape(bb, rows, c)
        acc = acc + pwb_ref[s][None, None, :]
        acc = acc * bn_ref[s, 0][None, None, :] + bn_ref[s, 1][None, None, :]
        h = jnp.maximum(acc, 0.0).astype(x_ref.dtype)
    out_ref[:] = h


def fused_sub_blocks(
    x: jax.Array,
    dw_w: jax.Array,   # [S, k, C]  depthwise taps
    dw_b: jax.Array,   # [S, C]
    pw_w: jax.Array,   # [S, C, C]  pointwise (in, out)
    pw_b: jax.Array,   # [S, C]
    bn: jax.Array,     # [S, 2, C]  folded BN (scale', shift')
    kernel_size: int,
    block_t: int = 512,
    block_b: int = 8,  # bb=16 at C=256/T=301 f32 overflows the 16M VMEM cap
) -> jax.Array:
    """x [B, T, C] -> [B, T, C]: a mega-block's fused sub-block chain."""
    b, t, c = x.shape
    s = dw_w.shape[0]
    pad = (kernel_size - 1) // 2
    halo = s * pad
    tb = min(block_t, t)
    t_pad = -(-t // tb) * tb
    bb = min(block_b, b)
    b_pad = -(-b // bb) * bb
    xp = jnp.pad(x, ((0, b_pad - b), (halo, halo + (t_pad - t)), (0, 0)))
    window = tb + 2 * halo
    n_t = t_pad // tb
    # overlapping windows, strided slices (no gather): [B, nT, window, C]
    wins = jnp.concatenate(
        [xp[:, j * tb : j * tb + window, :][:, None] for j in range(n_t)], axis=1
    )

    out = pl.pallas_call(
        functools.partial(_kernel, k=kernel_size, tb=tb, n_stages=s),
        grid=(b_pad // bb, n_t),
        in_specs=[
            pl.BlockSpec((bb, 1, window, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, kernel_size, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 2, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, tb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * s * (c * c + c * kernel_size),
            bytes_accessed=2 * b * t_pad * c * x.dtype.itemsize + s * c * c * 4,
            transcendentals=0,
        ),
    )(wins, dw_w.astype(jnp.float32), dw_b.astype(jnp.float32),
      pw_w.astype(x.dtype), pw_b.astype(jnp.float32), bn.astype(jnp.float32))
    return out[:b, :t, :]
