"""Fused TitaNet inference path.

Functionally replicates ``TitaNet.apply(..., train=False)`` with the
mega-block sub-chains running in the fused Pallas kernel
(:mod:`titanet_tpu.ops.pallas.megablock`) and everything else (prolog,
SE, skip, epilog, decoder) as plain XLA ops on extracted parameters.
Verified bit-close against the flax path (tests/test_fused_inference.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from titanet_tpu.models.titanet import TitaNet
from titanet_tpu.ops.conv import conv1d_same
from titanet_tpu.ops.pallas.megablock import fold_bn, fused_sub_blocks
from titanet_tpu.ops.pooling import attentive_stats


def _bn_affine(x, p, s, eps=1e-5):
    scale, shift = fold_bn(p["scale"], p["bias"], s["mean"], s["var"], eps)
    # scale/shift are f32 params: compute in f32, return in x's dtype so a
    # bf16 activation stream stays bf16 (VMEM footprint + MXU path)
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def _conv_block_eval(x, p, s, activation="relu"):
    """ConvBlock1d (non-depthwise) in eval mode."""
    kernel = p["conv"]["kernel"]
    if kernel.shape[0] == 1:
        x = jnp.einsum("btc,cf->btf", x, kernel[0].astype(x.dtype))
        x = x + p["conv"]["bias"].astype(x.dtype)
    else:
        x = conv1d_same(
            x, kernel.astype(x.dtype), p["conv"]["bias"].astype(x.dtype)
        )
    x = _bn_affine(x, p["norm"], s["norm"])
    return jax.nn.relu(x) if activation == "relu" else x


def _stack_mega_params(mp, ms, n_sub: int, dtype=None):
    """Pack a mega-block's sub-chain params for the fused kernel.

    ``dtype`` (the activation compute dtype) applies to the pointwise
    weights only — they feed the kernel's MXU dot against same-dtype
    activations; the depthwise taps, biases and folded BN vectors stay
    f32 (they enter the kernel's f32 accumulator directly)."""
    dw_w, dw_b, pw_w, pw_b, bn = [], [], [], [], []
    for i in range(n_sub):
        p = mp[f"sub_block_{i}"]
        s = ms[f"sub_block_{i}"]
        dw_w.append(p["conv"]["depthwise"]["kernel"][:, 0, :])  # [k, C]
        dw_b.append(p["conv"]["depthwise"]["bias"])
        pw_w.append(p["conv"]["pointwise"]["kernel"][0])  # [C, C]
        pw_b.append(p["conv"]["pointwise"]["bias"])
        scale, shift = fold_bn(
            p["norm"]["scale"], p["norm"]["bias"],
            s["norm"]["mean"], s["norm"]["var"],
        )
        bn.append(jnp.stack([scale, shift]))
    pw = jnp.stack(pw_w)
    if dtype is not None:
        pw = pw.astype(dtype)
    return (
        jnp.stack(dw_w), jnp.stack(dw_b), pw, jnp.stack(pw_b),
        jnp.stack(bn),
    )


def titanet_apply_fused(
    model: TitaNet,
    variables,
    mel: jax.Array,
    mask: Optional[jax.Array] = None,
    block_t: int = 512,
) -> jax.Array:
    """mel [B, T, n_mels] -> raw embeddings [B, E] (inference)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]

    # honor the model's compute dtype (bf16 serving): the flax path casts
    # via nn.Conv(dtype=...); here the activation stream itself carries it
    dt = jnp.dtype(model.dtype) if model.dtype is not None else mel.dtype
    x = _conv_block_eval(mel.astype(dt), enc_p["prolog"], enc_s["prolog"])
    for i in range(model.n_mega_blocks):
        mp, ms = enc_p[f"mega_block_{i}"], enc_s[f"mega_block_{i}"]
        packed = _stack_mega_params(mp, ms, model.n_sub_blocks, dtype=dt)
        y = fused_sub_blocks(
            x, *packed, kernel_size=model.mega_block_kernel_size, block_t=block_t
        )
        # SE (global mean over T, like the reference: pad-included)
        if mask is not None:
            m = mask.astype(y.dtype)[..., None]
            squeezed = jnp.sum(y * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), jnp.asarray(1.0, y.dtype)
            )
        else:
            squeezed = jnp.mean(y, axis=1)
        e = jax.nn.relu(squeezed @ mp["se"]["fc1"]["kernel"].astype(y.dtype))
        e = jax.nn.sigmoid(e @ mp["se"]["fc2"]["kernel"].astype(y.dtype))
        y = y * e[:, None, :]
        # skip: pointwise conv + BN
        skip = jnp.einsum("btc,cf->btf", x, mp["skip_conv"]["kernel"][0].astype(x.dtype))
        skip = skip + mp["skip_conv"]["bias"].astype(x.dtype)
        skip = _bn_affine(skip, mp["skip_norm"], ms["skip_norm"])
        x = jax.nn.relu(skip + y)

    x = _conv_block_eval(x, enc_p["epilog"], enc_s["epilog"])

    dec_p, dec_s = params["decoder"], stats["decoder"]
    if model.simple_pool:
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), jnp.asarray(1.0, x.dtype)
            )
        else:
            pooled = jnp.mean(x, axis=1)
        pooled = pooled @ dec_p["pool"]["linear"]["kernel"] + dec_p["pool"]["linear"]["bias"]
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
        pooled = _bn_affine(pooled, dec_p["pool_norm"], dec_s["pool_norm"])
    emb = pooled @ dec_p["linear"]["kernel"].astype(pooled.dtype) + dec_p["linear"][
        "bias"
    ].astype(pooled.dtype)
    return _bn_affine(emb, dec_p["linear_norm"], dec_s["linear_norm"])
