"""Int8 quantized TitaNet serving path.

Weight-and-activation int8 inference for the encoder's MXU-bound matmuls —
the sub-block pointwise convs, the mega-block skip convs and the epilog
(together ~97% of TitaNet's FLOPs; depthwise taps, SE and the decoder stay
bf16/f32 on the VPU, they are a rounding error of the compute). On v5e the
MXU's int8 path runs at 2x its bf16 peak, so a bf16-inference model that
already sits near the MXU roofline (BENCHMARKS.md) has headroom only through
narrower arithmetic.

Scheme (standard symmetric linear quantization):

- Weights: BatchNorm (eval) is folded into the preceding pointwise weight and
  bias FIRST, then each OUTPUT channel gets its own scale
  ``s_j = max_i |W'[i, j]| / 127`` (per-channel: the folded BN scale varies
  per channel by orders of magnitude, a single tensor scale would waste most
  of the 8 bits).
- Activations: dynamic per-row scales ``r_b = max_c |x[b, c]| / 127``
  computed on the fly (VPU work that XLA fuses into the adjacent ops).
- Accumulation: ``int8 @ int8 -> int32`` on the MXU
  (``preferred_element_type=int32``), dequantized as
  ``y = acc * r_b * s_j + bias'``.

The quantized forward mirrors ``TitaNet.apply(train=False)`` /
``titanet_apply_fused`` op-for-op otherwise (reference semantics:
src/models.py:318-339; pad-included SE statistics). Embedding quality is
parity-tested in tests/test_quantized.py and measured on the hard-EER corpus
(docs/eer_bench). No retraining/QAT required — post-training quantization.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from titanet_tpu.models.titanet import TitaNet
from titanet_tpu.ops.conv import conv1d_same
from titanet_tpu.ops.pallas.megablock import fold_bn
from titanet_tpu.ops.pooling import attentive_stats


class QuantLinear(NamedTuple):
    """Per-output-channel int8 weight: y = (xq @ w_q) * (r_row * scale) + bias."""

    w_q: jax.Array  # [C_in, C_out] int8
    scale: jax.Array  # [C_out] f32 (includes folded BN scale)
    bias: jax.Array  # [C_out] f32 (includes folded BN shift)


def _quantize_weight(w: jax.Array, bias: jax.Array) -> QuantLinear:
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantLinear(w_q, scale, bias.astype(jnp.float32))


def _fold_then_quantize(w, b, bn_p, bn_s, eps: float = 1e-5) -> QuantLinear:
    """Fold eval-mode BN into (w, b), then quantize per output channel."""
    bn_scale, bn_shift = fold_bn(
        bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"], eps
    )
    w = w.astype(jnp.float32) * bn_scale[None, :]
    b = b.astype(jnp.float32) * bn_scale + bn_shift
    return _quantize_weight(w, b)


def quantized_matmul(x: jax.Array, q: QuantLinear, relu: bool = False) -> jax.Array:
    """x [..., C_in] (float) -> [..., C_out] (f32). Dynamic per-row int8."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    r = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    r = jnp.maximum(r, 1e-12)
    x_q = jnp.clip(jnp.round(x2 / r), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, q.w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (r * q.scale[None, :]) + q.bias[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.reshape(shape[:-1] + (q.w_q.shape[1],))


class QuantMegaBlock(NamedTuple):
    dw_w: jax.Array  # [S, k, C] depthwise taps (bf16-path, VPU)
    dw_b: jax.Array  # [S, C]
    pw: tuple  # S x QuantLinear (pointwise + folded sub-block BN)
    se_fc1: jax.Array
    se_fc2: jax.Array
    skip: QuantLinear  # skip pointwise + folded skip BN


class QuantTitaNet(struct.PyTreeNode):
    """Quantized parameter tree (build once with :func:`quantize_titanet`).
    Architecture fields are pytree-static so the tree jits as an argument."""

    prolog_kernel: jax.Array  # [k, n_mels, H] (bf16-path: tiny FLOPs)
    prolog_bias: jax.Array
    prolog_bn: tuple  # (scale, shift)
    mega_blocks: tuple  # N x QuantMegaBlock
    epilog: QuantLinear  # [H, 1536] k=1 conv + folded BN
    decoder: dict  # small f32 tail, used as-is
    n_sub_blocks: int = struct.field(pytree_node=False)
    kernel_size: int = struct.field(pytree_node=False)
    simple_pool: bool = struct.field(pytree_node=False)


def quantize_titanet(model: TitaNet, variables) -> QuantTitaNet:
    """Extract + fold + quantize a trained TitaNet's variables (run once).

    Accepts either encoder layout: unrolled (``encoder/mega_block_{i}``)
    or ``scan_blocks`` (``encoder/mega_blocks``, auto-unstacked).
    """
    from titanet_tpu.models.titanet import unstack_mega_block_params

    params = variables["params"]
    stats = variables["batch_stats"]
    if "mega_blocks" in params["encoder"]:
        params = unstack_mega_block_params(params)
        stats = unstack_mega_block_params(stats)
    enc_p, enc_s = params["encoder"], stats["encoder"]

    prolog_bn = fold_bn(
        enc_p["prolog"]["norm"]["scale"], enc_p["prolog"]["norm"]["bias"],
        enc_s["prolog"]["norm"]["mean"], enc_s["prolog"]["norm"]["var"],
    )
    blocks = []
    for i in range(model.n_mega_blocks):
        mp, ms = enc_p[f"mega_block_{i}"], enc_s[f"mega_block_{i}"]
        dw_w, dw_b, pw = [], [], []
        for s in range(model.n_sub_blocks):
            p, st = mp[f"sub_block_{s}"], ms[f"sub_block_{s}"]
            dw_w.append(p["conv"]["depthwise"]["kernel"][:, 0, :])
            dw_b.append(p["conv"]["depthwise"]["bias"])
            pw.append(
                _fold_then_quantize(
                    p["conv"]["pointwise"]["kernel"][0],
                    p["conv"]["pointwise"]["bias"],
                    p["norm"], st["norm"],
                )
            )
        skip = _fold_then_quantize(
            mp["skip_conv"]["kernel"][0], mp["skip_conv"]["bias"],
            mp["skip_norm"], ms["skip_norm"],
        )
        blocks.append(
            QuantMegaBlock(
                dw_w=jnp.stack(dw_w), dw_b=jnp.stack(dw_b), pw=tuple(pw),
                se_fc1=mp["se"]["fc1"]["kernel"], se_fc2=mp["se"]["fc2"]["kernel"],
                skip=skip,
            )
        )
    epilog = _fold_then_quantize(
        enc_p["epilog"]["conv"]["kernel"][0], enc_p["epilog"]["conv"]["bias"],
        enc_p["epilog"]["norm"], enc_s["epilog"]["norm"],
    )
    return QuantTitaNet(
        prolog_kernel=enc_p["prolog"]["conv"]["kernel"],
        prolog_bias=enc_p["prolog"]["conv"]["bias"],
        prolog_bn=prolog_bn,
        mega_blocks=tuple(blocks),
        epilog=epilog,
        decoder={"params": params["decoder"], "stats": stats["decoder"]},
        n_sub_blocks=model.n_sub_blocks,
        kernel_size=model.mega_block_kernel_size,
        simple_pool=model.simple_pool,
    )


def _depthwise(x: jax.Array, taps: jax.Array, bias: jax.Array) -> jax.Array:
    """Same-padding K-tap depthwise conv as K shifted multiply-adds (VPU)."""
    k = taps.shape[0]
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t = x.shape[1]
    acc = xp[:, 0:t, :] * taps[0][None, None, :]
    for j in range(1, k):
        acc = acc + xp[:, j : j + t, :] * taps[j][None, None, :]
    return acc + bias[None, None, :]


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), jnp.asarray(1.0, x.dtype)
    )


def titanet_apply_quantized(
    q: QuantTitaNet, mel: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """mel [B, T, n_mels] -> raw embeddings [B, E] (int8 encoder matmuls)."""
    # prolog (k=3, n_mels->H): <1% of FLOPs, plain conv + folded BN + relu
    x = conv1d_same(mel.astype(jnp.float32), q.prolog_kernel, q.prolog_bias)
    x = jax.nn.relu(x * q.prolog_bn[0] + q.prolog_bn[1])

    for blk in q.mega_blocks:
        y = x
        for s in range(q.n_sub_blocks):
            y = _depthwise(y, blk.dw_w[s], blk.dw_b[s])
            y = quantized_matmul(y, blk.pw[s], relu=True)
        # SE: pad-included global mean (reference semantics) unless masked
        squeezed = _masked_mean(y, mask)
        e = jax.nn.relu(squeezed @ blk.se_fc1.astype(y.dtype))
        e = jax.nn.sigmoid(e @ blk.se_fc2.astype(y.dtype))
        y = y * e[:, None, :]
        skip = quantized_matmul(x, blk.skip)
        x = jax.nn.relu(skip + y)

    x = quantized_matmul(x, q.epilog, relu=True)

    # decoder: tiny f32 tail, identical to models/fused_inference.py
    dec_p, dec_s = q.decoder["params"], q.decoder["stats"]
    if q.simple_pool:
        pooled = _masked_mean(x, mask)
        pooled = (
            pooled @ dec_p["pool"]["linear"]["kernel"]
            + dec_p["pool"]["linear"]["bias"]
        )
    else:
        e = jnp.tanh(
            x @ dec_p["pool"]["in_linear"]["kernel"].astype(x.dtype)
            + dec_p["pool"]["in_linear"]["bias"].astype(x.dtype)
        )
        e = (
            e @ dec_p["pool"]["out_linear"]["kernel"].astype(x.dtype)
            + dec_p["pool"]["out_linear"]["bias"].astype(x.dtype)
        )
        pooled = attentive_stats(x, e, mask=mask)
        scale, shift = fold_bn(
            dec_p["pool_norm"]["scale"], dec_p["pool_norm"]["bias"],
            dec_s["pool_norm"]["mean"], dec_s["pool_norm"]["var"],
        )
        pooled = pooled * scale + shift
    emb = pooled @ dec_p["linear"]["kernel"] + dec_p["linear"]["bias"]
    scale, shift = fold_bn(
        dec_p["linear_norm"]["scale"], dec_p["linear_norm"]["bias"],
        dec_s["linear_norm"]["mean"], dec_s["linear_norm"]["var"],
    )
    return emb * scale + shift
