"""ResNet speaker embedding ("r-vector") — fourth model family.

2D residual convolutions over the mel spectrogram treated as a 1-channel
image (He et al., arXiv:1512.03385 blocks; speaker adaptation per Zeinali
et al., arXiv:1910.12592 "BUT system description to VoxCeleb SRC 2019" —
the r-vector recipe that set VoxCeleb SOTA and remains the standard
2D-conv family in production toolkits). The reference repo has no 2D-conv
family at all (/root/reference/src/models.py ships TitaNet + a d-vector
baseline); this completes the canonical embedder archetypes here:
depthwise-TDNN+SE (TitaNet), Res2Net+attention (ECAPA), plain TDNN
(x-vector), and 2D ResNet.

Structure (r-vector: ResNet34 over [T, F=80] with a 3x3 stem, no maxpool):

  stem     Conv3x3(1 -> C) -> BN -> ReLU
  stage1   N1 x BasicBlock(C,    stride 1)
  stage2   N2 x BasicBlock(2C,   first block stride 2)     T,F halve
  stage3   N3 x BasicBlock(4C,   first block stride 2)     T,F halve
  stage4   N4 x BasicBlock(8C,   first block stride 2)     T,F halve
  pool     flatten freq x chan [B, T/8, F/8 * 8C] -> mean+std over time
  head     Linear -> E

BasicBlock = Conv3x3 -> BN -> ReLU -> Conv3x3 -> BN, plus identity (or
1x1-conv+BN when the shape changes), ReLU after the add. depth=34 gives
(3,4,6,3) blocks and ~6.3M params at C=32 — the TitaNet-S/ECAPA-512 scale.

TPU-first design notes:

- channels-last NHWC ``[B, T, F, C]`` throughout — XLA:TPU's native conv
  layout; every 3x3 conv lowers to large MXU GEMMs (no depthwise/grouped
  convs anywhere, so this family has the highest GEMM fraction of the four).
- convs use torch-style FIXED padding (k//2 per side), not "SAME": SAME's
  pad split depends on the parity of T, which would misalign receptive
  fields between a solo forward and the same utterance padded inside a
  batch. Fixed padding keeps masked batched embeddings length-exact
  (``masked=True`` verification protocol, like the other families).
- convs are bias-free (BN immediately follows — torch ResNet convention),
  so zeroed pad frames stay exactly zero through the conv itself; invalid
  frames are re-zeroed after each block (see ``_zero_padded_2d``) because
  BN's shift makes them nonzero.
- the time mask downsamples with each stride-2 stage as ``mask[:, ::2]``
  (fixed padding centers output j on input 2j, so validity follows the
  center); BN train statistics use the full ``[B, T', F']`` mask so pad
  positions never pollute moments.
- no dropout (r-vector recipe), so the step's elementwise/PRNG slice is
  minimal; stats pooling reuses the mask-aware ``stats_pool`` shared with
  x-vector.

Drives ``train_step`` / ``embed_step`` / ``run_verification`` / the CLI /
serving unchanged (same calling convention as the other families).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.models.xvector import stats_pool
from titanet_tpu.ops.conv import torch_conv_init
from titanet_tpu.ops.norm import BatchNorm


def _zero_padded_2d(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero invalid frames of a ``[B, T, F, C]`` map (mask ``[B, T]``)."""
    if mask is None:
        return x
    return x * mask[:, :, None, None].astype(x.dtype)


def _bn_mask(x: jax.Array, mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """Time mask ``[B, T]`` -> full ``[B, T, F]`` mask for BatchNorm, whose
    masked-count is ``sum(mask)`` over all non-channel positions."""
    if mask is None:
        return None
    return jnp.broadcast_to(mask[:, :, None], x.shape[:3])


class Conv2dBn(nn.Module):
    """Bias-free 3x3/1x1 conv with torch-style fixed padding, then BN."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        pad = self.kernel_size // 2
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size * self.kernel_size
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=torch_conv_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )(x, mask=_bn_mask(x, mask) if train else None)
        return x


class BasicBlock2d(nn.Module):
    """conv3x3 -> BN -> ReLU -> conv3x3 -> BN, + skip, ReLU
    (He et al. basic block; the r-vector depths 18/34 use no bottleneck)."""

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,  # OUTPUT-resolution time mask
    ) -> jax.Array:
        common = dict(
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = Conv2dBn(self.features, 3, self.stride, name="conv1", **common)(
            x, train=train, mask=mask
        )
        h = _zero_padded_2d(nn.relu(h), mask)
        h = Conv2dBn(self.features, 3, 1, name="conv2", **common)(
            h, train=train, mask=mask
        )
        if self.stride != 1 or x.shape[-1] != self.features:
            skip = Conv2dBn(self.features, 1, self.stride, name="down", **common)(
                x, train=train, mask=mask
            )
        else:
            skip = x
        return _zero_padded_2d(nn.relu(h + skip), mask)


# depth -> per-stage block counts (He et al. Table 1, basic-block depths)
RESNET_DEPTHS: dict = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class SpeakerResNet(nn.Module):
    """mel ``[B, T, n_mels]`` -> raw embedding ``[B, E]``."""

    depth: int = 34
    base_channels: int = 32
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
        if self.depth not in RESNET_DEPTHS:
            raise ValueError(
                f"depth must be one of {sorted(RESNET_DEPTHS)}, got {self.depth}"
            )
        blocks = RESNET_DEPTHS[self.depth]
        common = dict(
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = x[..., None]  # [B, T, F, 1] — the mel map as a 1-channel image
        h = _zero_padded_2d(h, mask)
        h = Conv2dBn(self.base_channels, 3, 1, name="stem", **common)(
            h, train=train, mask=mask
        )
        h = _zero_padded_2d(nn.relu(h), mask)
        for stage, n_blocks in enumerate(blocks):
            feat = self.base_channels * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                if stride == 2 and mask is not None:
                    # fixed padding centers output j on input 2j, so
                    # validity follows the center frame
                    mask = mask[:, ::2]
                h = BasicBlock2d(
                    feat, stride, name=f"stage{stage + 1}_block{b + 1}", **common
                )(h, train=train, mask=mask)
        # [B, T', F', C] -> [B, T', F'*C]; freq is fully valid, so the
        # flatten folds it into channels and pooling stays time-only
        bsz, t_out = h.shape[0], h.shape[1]
        h = h.reshape(bsz, t_out, h.shape[2] * h.shape[3])
        pooled = stats_pool(h, mask=mask)
        return nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(pooled.shape[-1]),
            bias_init=torch_conv_init(pooled.shape[-1]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="embedding",
        )(pooled)


def get_resnet(
    depth: int = 34,
    base_channels: int = 32,
    embedding_size: int = 192,
    dtype: Optional[jnp.dtype] = None,
    axis_name: Optional[str] = None,
) -> SpeakerResNet:
    """Preset constructor. depth 34 / C=32 is the r-vector scale (~6.3M
    params); depth 18 gives a ~4.3M light variant."""
    return SpeakerResNet(
        depth=depth,
        base_channels=base_channels,
        embedding_size=embedding_size,
        dtype=dtype,
        axis_name=axis_name,
    )
