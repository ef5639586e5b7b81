"""Fused Pallas mel-spectrogram kernel.

One kernel fuses the whole per-frame chain that
:func:`titanet_tpu.ops.frontend.log_mel_spectrogram` expresses as separate
XLA ops:

  window -> real DFT (one [TN,512] @ [512,514] MXU matmul; GEMM-native DFT,
  cf. nnAudio/MelT in PAPERS.md) -> |.|^2 -> mel filterbank matmul
  ([TN,257+pad] @ [257+pad,128]) -> 10*log10 -> L2-normalize over mels

so the complex spectrum (the largest intermediate, 2x257 floats/frame) never
leaves VMEM. The frame gather stays in XLA (pure data movement that XLA
handles well); everything compute-bearing runs in-kernel.

Layout notes (pallas_guide.md):
- grid over frame blocks of TN=256 rows (sublane-aligned),
- the DFT basis is one [512, 514] matrix (cos | sin concatenated) so the
  real/imag parts come from a single MXU pass; 514 is padded to 640
  (5 x 128 lanes),
- mel output is padded 80 -> 128 lanes in-kernel and sliced by the caller.

Numerics match the jnp reference path to ~1e-5 relative (f32 accumulate);
``log_mel_spectrogram_pallas`` is a drop-in for the jnp version.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from titanet_tpu.ops.frontend import (
    FrontendConfig,
    _dft_matrices,
    frame_signal,
    mel_filterbank,
    padded_window,
)

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _fused_weights(cfg: FrontendConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(windowed DFT basis [n_fft, 2*bins_pad], mel fb [bins_pad, 128],
    n_bins). The window is folded into the DFT basis (one less VPU pass)."""
    n_bins = cfg.n_fft // 2 + 1
    bins_pad = _round_up(n_bins, _LANES)
    cos_m, sin_m = _dft_matrices(cfg.n_fft)
    window = padded_window(cfg.n_fft, cfg.win_length).astype(np.float64)[:, None]
    basis = np.zeros((cfg.n_fft, 2 * bins_pad), np.float32)
    basis[:, :n_bins] = cos_m * window
    basis[:, bins_pad : bins_pad + n_bins] = sin_m * window
    fb = mel_filterbank(n_bins, cfg.n_mels, cfg.sample_rate)
    fb_pad = np.zeros((bins_pad, _round_up(cfg.n_mels, _LANES)), np.float32)
    fb_pad[:n_bins, : cfg.n_mels] = fb
    return basis, fb_pad, n_bins


def _mel_kernel(frames_ref, basis_ref, fb_ref, out_ref, *, bins_pad, n_mels):
    frames = frames_ref[:]  # [TN, n_fft]
    # HIGHEST precision: the MXU's native bf16 passes lose ~5e-2 through the
    # power->dB->L2 chain (power spans 1e-10..1); the DFT is parity-critical.
    spec = jnp.dot(
        frames, basis_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    re = spec[:, :bins_pad]
    im = spec[:, bins_pad:]
    power = re * re + im * im  # [TN, bins_pad]; padded bins are exactly 0
    mel = jnp.dot(
        power, fb_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # L2 norm over the real mel bins only (padded lanes hold 10*log10(1e-10))
    col = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
    masked = jnp.where(col < n_mels, db, 0.0)
    norm = jnp.sqrt(jnp.sum(masked * masked, axis=1, keepdims=True))
    out_ref[:] = masked / jnp.maximum(norm, 1e-12)


def _mel_frames_pallas(frames: jax.Array, cfg: FrontendConfig, block: int = 256):
    """frames [N, n_fft] -> normalized log-mel [N, n_mels]."""
    basis, fb_pad, n_bins = _fused_weights(cfg)
    bins_pad = fb_pad.shape[0]
    mels_pad = fb_pad.shape[1]
    n = frames.shape[0]
    n_pad = _round_up(max(n, block), block)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block,)
    out = pl.pallas_call(
        functools.partial(_mel_kernel, bins_pad=bins_pad, n_mels=cfg.n_mels),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, cfg.n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, 2 * bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_pad, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * cfg.n_fft * 2 * bins_pad + 2 * n_pad * bins_pad * mels_pad,
            bytes_accessed=n_pad * (cfg.n_fft + mels_pad) * 4,
            transcendentals=n_pad * mels_pad,
        ),
    )(frames.astype(jnp.float32), jnp.asarray(basis), jnp.asarray(fb_pad))
    return out[:n, : cfg.n_mels]


def log_mel_spectrogram_pallas(
    waveform: jax.Array,
    cfg: FrontendConfig,
    lengths: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in fused replacement for
    :func:`titanet_tpu.ops.frontend.log_mel_spectrogram` ([B, T] -> [B, F, M])."""
    b = waveform.shape[0]
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, lengths=lengths)
    n_frames = frames.shape[1]
    out = _mel_frames_pallas(frames.reshape(b * n_frames, cfg.n_fft), cfg)
    out = out.reshape(b, n_frames, cfg.n_mels)
    mask = None
    if lengths is not None:
        frame_ids = jnp.arange(n_frames)[None, :]
        valid = 1 + lengths[:, None] // cfg.hop_length
        mask = (frame_ids < valid).astype(out.dtype)
        out = out * mask[..., None]
    return out, mask
