"""Fused attentive-statistics-pooling Pallas kernel (fwd + custom VJP).

Rebuild of the reference ``AttentiveStatsPooling`` hot path
(``/root/reference/src/models.py:532-584``) as ONE kernel over the encoder
output ``y [B, T, C]``:

  u = tanh(y @ Wa + ba)        # [T, H]   (MXU)
  e = u @ Wb + bb              # [T, C]   (MXU)
  alpha = softmax_T(e)         # f32, in VMEM
  mean  = sum_t alpha * y
  std   = sqrt(clip(sum_t alpha * y^2 - mean^2, eps))
  out   = [mean | std]         # [B, 2C]

Why a kernel: under XLA the ``[B, T, C]`` energies tensor (118 MB at
B=128, T=301, C=1536, bf16) round-trips HBM and ``y`` is re-read by the
softmax/moment reductions — the pooling region measures ~2.7 ms of a
27 ms TitaNet-S train step (profile_train.py) while its GEMMs are only
~30 GFLOP. Here ``e``/``alpha`` live entirely in VMEM: traffic is one read
of ``y`` (fwd) and one read + one ``dy`` write (bwd).

The backward kernel recomputes u/e/alpha from ``y`` (FLOPs are cheap,
bytes are not) and accumulates weight gradients in f32 directly in
persistent output blocks across the batch grid.

Used by :class:`titanet_tpu.ops.pooling.AttentiveStatsPooling` when
eligible (TPU, no mask, lane-aligned C/H); the jnp path remains both the
parity reference and the fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def kernel_supports(n_channels: int, hidden: int, t: int, dtype) -> bool:
    """Eligibility for the fused kernel: lane-aligned channel dims and a
    time axis that fits one VMEM tile comfortably."""
    return (
        n_channels % _LANES == 0
        and hidden % _LANES == 0
        and 1 <= t <= 4096
        and dtype in (jnp.bfloat16, jnp.float32)
    )


def _softmax_t(e: jax.Array) -> jax.Array:
    """Numerically-stable softmax over axis 0 (time), f32."""
    m = jnp.max(e, axis=0, keepdims=True)
    a = jnp.exp(e - m)
    return a / jnp.sum(a, axis=0, keepdims=True)


def _fwd_kernel(y_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref, *, bt, eps):
    # out_ref: [1, bt, 2C] — grouped 3D so the (bt, 2C) tile satisfies
    # Mosaic's block-dim rule for small bt
    cdim = y_ref.shape[-1]
    for r in range(bt):
        y = y_ref[r]  # [T, C] compute dtype
        u = jnp.tanh(
            jnp.dot(y, wa_ref[:], preferred_element_type=jnp.float32)
            + ba_ref[:].astype(jnp.float32)
        )
        e = (
            jnp.dot(u.astype(y.dtype), wb_ref[:], preferred_element_type=jnp.float32)
            + bb_ref[:].astype(jnp.float32)
        )
        alpha = _softmax_t(e)
        yf = y.astype(jnp.float32)
        wy = alpha * yf
        mean = jnp.sum(wy, axis=0)
        q = jnp.sum(wy * yf, axis=0)
        std = jnp.sqrt(jnp.clip(q - mean * mean, eps, None))
        out_ref[0, r, :cdim] = mean.astype(out_ref.dtype)
        out_ref[0, r, cdim:] = std.astype(out_ref.dtype)


def _bwd_kernel(
    y_ref, wa_ref, ba_ref, wb_ref, bb_ref, g_ref,
    dy_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
    *, bt, eps,
):
    cdim = y_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dba_ref[:] = jnp.zeros_like(dba_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        dbb_ref[:] = jnp.zeros_like(dbb_ref)

    for r in range(bt):
        y = y_ref[r]
        dt = y.dtype
        # recompute the forward (FLOPs over bytes)
        u = jnp.tanh(
            jnp.dot(y, wa_ref[:], preferred_element_type=jnp.float32)
            + ba_ref[:].astype(jnp.float32)
        )
        e = (
            jnp.dot(u.astype(dt), wb_ref[:], preferred_element_type=jnp.float32)
            + bb_ref[:].astype(jnp.float32)
        )
        alpha = _softmax_t(e)
        yf = y.astype(jnp.float32)
        wy = alpha * yf
        mean = jnp.sum(wy, axis=0)
        q = jnp.sum(wy * yf, axis=0)
        resid = q - mean * mean
        std = jnp.sqrt(jnp.clip(resid, eps, None))

        dm = g_ref[0, r, :cdim].astype(jnp.float32)
        ds = g_ref[0, r, cdim:].astype(jnp.float32)
        dresid = jnp.where(resid > eps, ds * 0.5 / std, 0.0)  # [C]
        dmt = dm - 2.0 * mean * dresid  # d wrt mean (total)
        # Ordered to minimize simultaneously-live [T, C] f32 temps (the bwd
        # kernel is VMEM-stack-bound, not FLOP-bound).
        dalpha = yf * dmt[None, :] + (yf * yf) * dresid[None, :]
        t_sum = jnp.sum(alpha * dalpha, axis=0)
        de = alpha * (dalpha - t_sum[None, :])  # [T, C] f32; dalpha dead
        dbb_ref[:] += jnp.sum(de, axis=0)[None, :]
        de_c = de.astype(dt)  # f32 de dead past here
        dy = alpha * (dmt[None, :] + 2.0 * yf * dresid[None, :])  # alpha dead
        # e = u @ Wb + bb
        du = jax.lax.dot_general(
            de_c, wb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, H]
        dwb_ref[:] += jax.lax.dot_general(
            u.astype(dt), de_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # u = tanh(y @ Wa + ba)
        dz = du * (1.0 - u * u)  # [T, H] f32
        dz_c = dz.astype(dt)
        dba_ref[:] += jnp.sum(dz, axis=0)[None, :]
        dy = dy + jax.lax.dot_general(
            dz_c, wa_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwa_ref[:] += jax.lax.dot_general(
            y, dz_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dy_ref[r] = dy.astype(dy_ref.dtype)


def _pad_rows(x: jax.Array, bt: int) -> Tuple[jax.Array, int]:
    b = x.shape[0]
    b_pad = ((b + bt - 1) // bt) * bt
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b),) + ((0, 0),) * (x.ndim - 1))
    return x, b_pad


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attentive_pool_fused(
    y: jax.Array,
    wa: jax.Array,
    ba: jax.Array,
    wb: jax.Array,
    bb: jax.Array,
    eps: float = 1e-6,
    bt: int = 4,
) -> jax.Array:
    """Fused attentive-stats pooling: ``y [B, T, C] -> [B, 2C]`` (y.dtype).

    ``wa [C, H]``, ``ba [H]``, ``wb [H, C]``, ``bb [C]`` — the same tensors
    the jnp path's in/out Dense layers use. Differentiable via a recompute
    backward kernel.
    """
    out, _ = _fwd_impl(y, wa, ba, wb, bb, eps, bt)
    return out


def _fwd_impl(y, wa, ba, wb, bb, eps, bt):
    b, t, c = y.shape
    dt = y.dtype
    yp, b_pad = _pad_rows(y, bt)
    grid = (b_pad // bt,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bt=bt, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ba.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bt, 2 * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad // bt, bt, 2 * c), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * t * c * wa.shape[1],
            bytes_accessed=yp.size * yp.dtype.itemsize + b_pad * 2 * c * 4,
            transcendentals=2 * b_pad * t * c,
        ),
        interpret=_use_interpret(),
    )(
        yp,
        wa.astype(dt),
        ba.astype(jnp.float32)[None, :],
        wb.astype(dt),
        bb.astype(jnp.float32)[None, :],
    )
    return out.reshape(b_pad, 2 * c)[:b], (y, wa, ba, wb, bb)


def _bwd_impl(eps, bt, res, g):
    y, wa, ba, wb, bb = res
    b, t, c = y.shape
    h = wa.shape[1]
    dt = y.dtype
    # the recompute bwd holds several [T, C] f32 temps per row — halve the
    # batch tile vs fwd to stay inside the VMEM stack budget
    bt = max(bt // 2, 1)
    yp, b_pad = _pad_rows(y, bt)
    gp, _ = _pad_rows(g.astype(dt), bt)
    gp = gp.reshape(b_pad // bt, bt, 2 * c)
    grid = (b_pad // bt,)
    dy, dwa, dba, dwb, dbb = pl.pallas_call(
        functools.partial(_bwd_kernel, bt=bt, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bt, 2 * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, t, c), dt),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b_pad * t * c * h,
            bytes_accessed=2 * yp.size * yp.dtype.itemsize,
            transcendentals=2 * b_pad * t * c,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_use_interpret(),
    )(
        yp,
        wa.astype(dt),
        ba.astype(jnp.float32)[None, :],
        wb.astype(dt),
        bb.astype(jnp.float32)[None, :],
        gp,
    )
    return (
        dy[:b],
        dwa.astype(wa.dtype),
        dba[0].astype(ba.dtype),
        dwb.astype(wb.dtype),
        dbb[0].astype(bb.dtype),
    )


attentive_pool_fused.defvjp(
    lambda y, wa, ba, wb, bb, eps, bt: _fwd_impl(y, wa, ba, wb, bb, eps, bt),
    _bwd_impl,
)
