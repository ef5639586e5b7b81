"""Fused depthwise-conv1d BACKWARD Pallas kernel (single pass over x, dy).

Bounded experiment for the last recorded train-step lever (VERDICT r3
item 8): XLA derives the grouped-conv gradients of the reference's
depthwise stage (``/root/reference/src/modules.py:43-93``) as TWO
separate convolutions — a dy*w_flip conv for ``dx`` (reads dy) and an
x-vs-dy correlation for ``dk`` (reads x AND dy again). At B=128, T=301,
C=256 bf16 that is ~3 tensor reads + 1 write of ~19.7 MB each, per
depthwise conv, ~51 times per TitaNet-S step — and the step is
HBM-bandwidth-bound (BENCHMARKS.md roofline).

This kernel computes ``dx``, ``dk`` and ``db`` in ONE pass: each (x, dy)
batch tile is DMA'd into VMEM once; ``dx`` is K shifted multiply-adds on
the VPU, ``dk``/``db`` are K shifted multiply-reduces accumulated in f32
in persistent output blocks across the sequential batch grid (the same
accumulation pattern as ``ops/pallas/pool.py``). Traffic drops from
~4 to ~3 tensor movements per conv.

The FORWARD stays XLA's grouped ``conv_general_dilated`` — swapping it
measured -24% in the full step (breaks XLA's conv+BN+relu fusion
chains, BENCHMARKS.md); only the backward is replaced, exactly like the
earlier shifted-adds attempt (``ops/conv.py::depthwise_conv1d_same``)
whose XLA-side [B,T,C] f32 temps made it LOSE (32.6 vs 26.7 ms/step).
Here the temps live in VMEM only.

Routing: opt-in via ``SamePadConv1d`` (env ``TITANET_DW_BWD=pallas``)
so the full-step A/B measurement is a one-variable experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def kernel_supports(t: int, c: int, k: int, dtype) -> bool:
    """Lane-aligned channels, odd K, bf16 (the f32 model path is the
    torchaudio-parity surface and stays on XLA)."""
    return (
        c % _LANES == 0
        and k % 2 == 1
        and 1 <= t <= 4096
        and dtype == jnp.bfloat16
    )


def _shift2(v: jax.Array, s: int) -> jax.Array:
    """``out[t] = v[t + s]`` along axis 1 of ``[bt, T, C]``, zero fill."""
    if s == 0:
        return v
    bt, t, c = v.shape
    zeros = jnp.zeros((bt, abs(s), c), v.dtype)
    if s > 0:
        return jnp.concatenate([v[:, s:, :], zeros], axis=1)
    return jnp.concatenate([zeros, v[:, :s, :]], axis=1)


def _bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dk_ref, db_ref, *, k):
    pad = (k - 1) // 2

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    dy = dy_ref[:]
    dt = dy.dtype
    # dx[t] = sum_i w[i] * dy[t + pad - i]  (VPU multiply-adds, f32 accum)
    dx = None
    for i in range(k):
        term = _shift2(dy, pad - i).astype(jnp.float32) * w_ref[i, :]
        dx = term if dx is None else dx + term
    dx_ref[:] = dx.astype(dt)
    # dk[i] = sum_{b,t} x[t + i - pad] * dy[t];  db = sum dy
    for i in range(k):
        dk_ref[i, :] += jnp.sum(
            (_shift2(x, i - pad) * dy).astype(jnp.float32), axis=(0, 1)
        )
    db_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=(0, 1))[None, :]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bt_for(t: int, c: int) -> int:
    """Batch tile sized so x/dy/dx blocks (3 tensors + f32 temps) stay
    well inside VMEM at any eval-length T (the r3 pool-kernel OOM
    lesson: scale the tile with T, CLAUDE.md)."""
    bytes_per_row = t * c * (3 * 2 + 8)  # 3 bf16 blocks + ~2 f32 temps
    budget = 48 * 2**20
    return max(1, min(8, budget // max(bytes_per_row, 1)))


def _dw_bwd_pallas(x: jax.Array, kernel: jax.Array, dy: jax.Array):
    """Single-pass depthwise-conv gradients.

    Args: ``x, dy: [B, T, C]``; ``kernel: [K, 1, C]`` (WIO, groups=C).
    Returns ``(dx [B,T,C] x.dtype, dk [K,1,C] f32, db [C] f32)``.
    """
    b, t, c = x.shape
    k = kernel.shape[0]
    bt = _bt_for(t, c)
    b_pad = ((b + bt - 1) // bt) * bt
    if b_pad != b:
        padw = ((0, b_pad - b), (0, 0), (0, 0))
        x = jnp.pad(x, padw)
        dy = jnp.pad(dy, padw)
    w = kernel[:, 0, :].astype(jnp.float32)  # [K, C]
    grid = (b_pad // bt,)
    dx, dk, db = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, t, c), x.dtype),
            jax.ShapeDtypeStruct((k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * k * b_pad * t * c,
            bytes_accessed=3 * b_pad * t * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_use_interpret(),
    )(x, dy, w)
    return dx[:b], dk[:, None, :], db[0]


@jax.custom_vjp
def depthwise_conv1d_fused_bwd(x: jax.Array, kernel: jax.Array, bias: jax.Array):
    """Depthwise same-pad conv (stride 1, odd K): XLA forward, fused
    single-pass Pallas backward. Signature matches
    ``ops.conv.depthwise_conv1d_same``."""
    from titanet_tpu.ops.conv import conv1d_same

    return conv1d_same(x, kernel, bias, groups=x.shape[-1])


def _fwd(x, kernel, bias):
    return depthwise_conv1d_fused_bwd(x, kernel, bias), (x, kernel)


def _bwd(res, dy):
    x, kernel = res
    dx, dk, db = _dw_bwd_pallas(x, kernel, dy)
    return dx, dk.astype(kernel.dtype), db


depthwise_conv1d_fused_bwd.defvjp(_fwd, _bwd)
