"""Baseline models: DumbConvNet (smoke test) and DVectorBaseline (LSTM).

Rebuilds of the reference baselines (``/root/reference/src/models.py:11-159``):

- :class:`DumbConvNet` — stacked ConvBlock1d + linear + mean pool,
  "used to test the learning loop" (src/models.py:11-14),
- :class:`DVectorBaseline` — the d-vector recurrent baseline (Wan et al.,
  arXiv:1710.10467): overlapping 160-frame segments -> 3-layer LSTM ->
  mean-or-last hidden state -> linear projection -> mean over segments
  (src/models.py:70-159). Segmentation here is a static reshape/gather and
  the LSTM runs under ``lax.scan`` (single trace, TPU-friendly); all
  segments across the batch run through the LSTM as one big batch, as in
  the reference's ``[B*N, ...]`` stacking.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from titanet_tpu.models.titanet import ConvBlock1d
from titanet_tpu.ops.conv import torch_conv_init


class DumbConvNet(nn.Module):
    """[B, T, M] -> [B, E] via n_layers ConvBlocks, linear, avg pool."""

    hidden_size: int = 256
    embedding_size: int = 192
    kernel_size: int = 3
    n_layers: int = 1
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        for i in range(self.n_layers):
            x = ConvBlock1d(
                features=self.hidden_size,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x, train=train, mask=mask)
        x = nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(self.hidden_size),
            bias_init=torch_conv_init(self.hidden_size),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc",
        )(x)
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            return jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), jnp.asarray(1.0, x.dtype)
            )
        return jnp.mean(x, axis=1)


class DVectorBaseline(nn.Module):
    """[B, T, M] -> [B, E]: segment, LSTM, collapse, project, average.

    ``segment_length`` frames with 50% overlap (reference unfold at
    src/models.py:121-130). Input shorter than one segment is right-padded.
    """

    n_lstm_layers: int = 3
    hidden_size: int = 768
    lstm_average: bool = True
    embedding_size: int = 256
    segment_length: int = 160
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        del mask  # reference ignores lengths here too
        b, t, m = x.shape
        seg, hop = self.segment_length, self.segment_length // 2
        if t < seg:
            x = jnp.pad(x, ((0, 0), (0, seg - t), (0, 0)))
            t = seg
        n_segments = max((t - seg) // hop + 1, 1)
        starts = np.arange(n_segments) * hop
        idx = starts[:, None] + np.arange(seg)[None, :]  # [N, S] static
        segments = x[:, idx, :]  # [B, N, S, M]
        segments = segments.reshape(b * n_segments, seg, m)

        h = segments
        for layer in range(self.n_lstm_layers):
            # the RNN wrapper is scope-transparent: the cell's params live
            # directly under this module, keyed by the cell's name
            cell = nn.OptimizedLSTMCell(
                self.hidden_size, param_dtype=self.param_dtype,
                name=f"lstm_{layer}",
            )
            h = nn.RNN(cell)(h)
        outputs = h.mean(axis=1) if self.lstm_average else h[:, -1, :]
        proj = nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(self.hidden_size),
            bias_init=torch_conv_init(self.hidden_size),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="projection",
        )(outputs)
        return proj.reshape(b, n_segments, self.embedding_size).mean(axis=1)
