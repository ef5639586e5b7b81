"""Fused attentive-statistics-pooling Pallas kernel (fwd + custom VJP).

Rebuild of the reference ``AttentiveStatsPooling`` hot path
(``/root/reference/src/models.py:532-584``) as ONE kernel over the encoder
output ``y [B, T, C]``:

  y = relu(a * h + c)  (optional fold of the epilog BatchNorm apply+relu)
  u = tanh(y @ Wa + ba)        # [T, H]   (MXU)
  e = u @ Wb + bb              # [T, C]   (MXU)
  alpha = softmax_T(e)         # f32, in VMEM
  mean  = sum_t alpha * y
  std   = sqrt(clip(sum_t alpha * y^2 - mean^2, eps))
  out   = [mean | std]         # [B, 2C]

Why a kernel: under XLA the ``[B, T, C]`` energies tensor (118 MB at
B=128, T=301, C=1536, bf16) round-trips HBM and ``y`` is re-read by the
softmax/moment reductions — the pooling region measured ~2.7 ms of a
27 ms TitaNet-S train step (profile_train.py) while its GEMMs are only
~30 GFLOP. Here ``e``/``alpha`` live entirely in VMEM: traffic is one read
of the input (fwd) and one read + one gradient write (bwd).

The fold (``a``/``c`` per-channel f32 vectors from
``BatchNorm(..., return_scale_shift=True)``) additionally absorbs the
encoder-epilog BN apply + relu, so the post-BN activation never exists in
HBM either; gradients to the batch statistics flow through ``a``/``c``
outside the kernel by autodiff.

The backward kernel recomputes y/u/e/alpha from the input (FLOPs are
cheap, bytes are not) and accumulates weight/fold gradients in f32
directly in persistent output blocks across the batch grid.

Used by :class:`titanet_tpu.ops.pooling.AttentiveStatsPooling` when
eligible (TPU, no mask, lane-aligned C/H); the jnp path remains both the
parity reference and the fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def kernel_supports(n_channels: int, hidden: int, t: int, dtype) -> bool:
    """Eligibility for the fused kernel: lane-aligned channel dims and a
    time axis that fits one VMEM tile comfortably. bf16 only — the kernel
    IS usable with f32 inputs (tests call it directly), but f32 models are
    the torchaudio-parity surface and stay on the XLA path, whose matmul
    precision is controlled there."""
    return (
        n_channels % _LANES == 0
        and hidden % _LANES == 0
        and 1 <= t <= 4096
        and dtype == jnp.bfloat16
    )


def _softmax_t(e: jax.Array) -> jax.Array:
    """Numerically-stable softmax over axis 0 (time), f32."""
    m = jnp.max(e, axis=0, keepdims=True)
    a = jnp.exp(e - m)
    return a / jnp.sum(a, axis=0, keepdims=True)


def _row_forward(h, a_ref, c_ref, wa_ref, ba_ref, wb_ref, bb_ref, fold):
    """Shared fwd recompute: returns (yf f32, y compute-dtype, u, alpha)."""
    dt = h.dtype
    if fold:
        yf = jnp.maximum(
            h.astype(jnp.float32) * a_ref[:] + c_ref[:], 0.0
        )
        y = yf.astype(dt)
    else:
        y = h
        yf = h.astype(jnp.float32)
    u = jnp.tanh(
        jnp.dot(y, wa_ref[:], preferred_element_type=jnp.float32)
        + ba_ref[:].astype(jnp.float32)
    )
    e = (
        jnp.dot(u.astype(dt), wb_ref[:], preferred_element_type=jnp.float32)
        + bb_ref[:].astype(jnp.float32)
    )
    return yf, y, u, _softmax_t(e)


def _fwd_kernel(
    h_ref, a_ref, c_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref,
    *, bt, eps, fold,
):
    # out_ref: [1, bt, 2C] — grouped 3D so the (bt, 2C) tile satisfies
    # Mosaic's block-dim rule for small bt
    cdim = h_ref.shape[-1]
    for r in range(bt):
        yf, _, _, alpha = _row_forward(
            h_ref[r], a_ref, c_ref, wa_ref, ba_ref, wb_ref, bb_ref, fold
        )
        wy = alpha * yf
        mean = jnp.sum(wy, axis=0)
        q = jnp.sum(wy * yf, axis=0)
        std = jnp.sqrt(jnp.clip(q - mean * mean, eps, None))
        out_ref[0, r, :cdim] = mean.astype(out_ref.dtype)
        out_ref[0, r, cdim:] = std.astype(out_ref.dtype)


def _bwd_kernel(
    h_ref, a_ref, c_ref, wa_ref, ba_ref, wb_ref, bb_ref, g_ref,
    dh_ref, da_ref, dc_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
    *, bt, eps, fold,
):
    cdim = h_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        da_ref[:] = jnp.zeros_like(da_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dba_ref[:] = jnp.zeros_like(dba_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        dbb_ref[:] = jnp.zeros_like(dbb_ref)

    for r in range(bt):
        h = h_ref[r]
        dt = h.dtype
        # recompute the forward (FLOPs over bytes)
        yf, y, u, alpha = _row_forward(
            h, a_ref, c_ref, wa_ref, ba_ref, wb_ref, bb_ref, fold
        )
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
        if fold:
            # y = relu(a*h + c): fold the BN-apply backward in-kernel
            dpre = jnp.where(yf > 0.0, dy, 0.0)  # f32 [T, C]
            hf = h.astype(jnp.float32)
            da_ref[:] += jnp.sum(dpre * hf, axis=0)[None, :]
            dc_ref[:] += jnp.sum(dpre, axis=0)[None, :]
            dh_ref[r] = (dpre * a_ref[:]).astype(dh_ref.dtype)
        else:
            dh_ref[r] = dy.astype(dh_ref.dtype)


def _pad_rows(x: jax.Array, bt: int) -> Tuple[jax.Array, int]:
    b = x.shape[0]
    b_pad = ((b + bt - 1) // bt) * bt
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b),) + ((0, 0),) * (x.ndim - 1))
    return x, b_pad


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attentive_pool_fused(
    h: jax.Array,
    a: jax.Array,
    c: jax.Array,
    wa: jax.Array,
    ba: jax.Array,
    wb: jax.Array,
    bb: jax.Array,
    eps: float = 1e-6,
    bt: int = 4,
    fold: bool = False,
) -> jax.Array:
    """Fused attentive-stats pooling: ``h [B, T, C] -> [B, 2C]`` (h.dtype).

    With ``fold=True`` the kernel first applies ``y = relu(a*h + c)``
    (per-channel f32 fold vectors, e.g. from BatchNorm); with ``fold=False``
    ``h`` is pooled directly and ``a``/``c`` are ignored (pass zeros).
    ``wa [C, H]``, ``ba [H]``, ``wb [H, C]``, ``bb [C]`` — the same tensors
    the jnp path's in/out Dense layers use. Differentiable via a recompute
    backward kernel.
    """
    out, _ = _fwd_impl(h, a, c, wa, ba, wb, bb, eps, bt, fold)
    return out


def _common_specs(wa, wb, c_):
    return [
        pl.BlockSpec((1, c_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wa.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(wb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wb.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(h, a, c, wa, ba, wb, bb, eps, bt, fold):
    b, t, cdim = h.shape
    dt = h.dtype
    hp, b_pad = _pad_rows(h, bt)
    grid = (b_pad // bt,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bt=bt, eps=eps, fold=fold),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, cdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + _common_specs(wa, wb, cdim),
        out_specs=pl.BlockSpec(
            (1, bt, 2 * cdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad // bt, bt, 2 * cdim), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * t * cdim * wa.shape[1],
            bytes_accessed=hp.size * hp.dtype.itemsize + b_pad * 2 * cdim * 4,
            transcendentals=2 * b_pad * t * cdim,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_use_interpret(),
    )(
        hp,
        a.astype(jnp.float32)[None, :],
        c.astype(jnp.float32)[None, :],
        wa.astype(dt),
        ba.astype(jnp.float32)[None, :],
        wb.astype(dt),
        bb.astype(jnp.float32)[None, :],
    )
    return out.reshape(b_pad, 2 * cdim)[:b], (h, a, c, wa, ba, wb, bb)


def _bwd_impl(eps, bt, fold, res, g):
    h, a, c, wa, ba, wb, bb = res
    b, t, cdim = h.shape
    hdim = wa.shape[1]
    dt = h.dtype
    # the recompute bwd holds several [T, C] f32 temps per row — halve the
    # batch tile vs fwd to stay inside the VMEM stack budget
    bt = max(bt // 2, 1)
    hp, b_pad = _pad_rows(h, bt)
    gp, _ = _pad_rows(g.astype(dt), bt)
    gp = gp.reshape(b_pad // bt, bt, 2 * cdim)
    grid = (b_pad // bt,)
    dh, da, dc, dwa, dba, dwb, dbb = pl.pallas_call(
        functools.partial(_bwd_kernel, bt=bt, eps=eps, fold=fold),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, cdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + _common_specs(wa, wb, cdim) + [
            pl.BlockSpec(
                (1, bt, 2 * cdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bt, t, cdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, cdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, t, cdim), dt),
            jax.ShapeDtypeStruct((1, cdim), jnp.float32),
            jax.ShapeDtypeStruct((1, cdim), jnp.float32),
            jax.ShapeDtypeStruct((cdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, cdim), jnp.float32),
            jax.ShapeDtypeStruct((1, cdim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b_pad * t * cdim * hdim,
            bytes_accessed=2 * hp.size * hp.dtype.itemsize,
            transcendentals=2 * b_pad * t * cdim,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_use_interpret(),
    )(
        hp,
        a.astype(jnp.float32)[None, :],
        c.astype(jnp.float32)[None, :],
        wa.astype(dt),
        ba.astype(jnp.float32)[None, :],
        wb.astype(dt),
        bb.astype(jnp.float32)[None, :],
        gp,
    )
    return (
        dh[:b],
        da[0].astype(a.dtype),
        dc[0].astype(c.dtype),
        dwa.astype(wa.dtype),
        dba[0].astype(ba.dtype),
        dwb.astype(wb.dtype),
        dbb[0].astype(bb.dtype),
    )


attentive_pool_fused.defvjp(
    lambda h, a, c, wa, ba, wb, bb, eps, bt, fold: _fwd_impl(
        h, a, c, wa, ba, wb, bb, eps, bt, fold
    ),
    _bwd_impl,
)
