"""On-device audio frontend: waveform -> log-mel spectrogram.

TPU-native rebuild of the reference CPU frontend
(``/root/reference/src/transforms.py:111-203``), which ran torchaudio's
Spectrogram -> MelScale -> AmplitudeToDB -> F.normalize per example, per
epoch, on the host. Here the whole chain is a batched, jittable device
computation:

  frame (strided gather) -> window -> rFFT -> |.|^2
    -> mel filterbank matmul (MXU) -> 10*log10 -> L2 norm over mels

Exact-parity notes vs torchaudio defaults (SURVEY.md §7 hard part 1):

- ``torch.stft``: center=True, pad_mode="reflect" (n_fft//2 each side),
  periodic Hann of ``win_length`` zero-padded symmetrically to ``n_fft``,
  ``n_frames = 1 + T // hop``, onesided, not normalized.
- ``MelScale``: HTK mel scale (2595 log10(1 + f/700)), f_min=0,
  f_max=sr/2, no filterbank area normalization.
- ``AmplitudeToDB`` (power): ``10 * log10(clamp(x, 1e-10))``, ref=1.0,
  no top_db clamping.
- ``F.normalize(dim=mel)``: L2 over the mel axis, eps=1e-12.

Variable lengths: utterances are right-padded with zeros in the waveform
batch; ``frames_mask`` marks frames ``< 1 + length // hop`` valid, and the
log-mel output is zeroed outside the mask — bit-identical to the reference's
"compute per-example then zero-pad spectrograms" collation
(``src/datasets.py:64-71``).

The DFT is also available as a real matmul (``use_matmul_dft=True``):
for n_fft=512 the rFFT is a ``[.,512] @ [512, 514]`` GEMM that XLA maps
straight onto the MXU and fuses with the mel matmul — the building block
for the fused Pallas kernel in ``titanet_tpu.ops.pallas.melspec`` (cf.
nnAudio/MelT, PAPERS.md).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)


def padded_window(n_fft: int, win_length: int, dtype=np.float32) -> np.ndarray:
    """Window zero-padded symmetrically to n_fft (torch.stft semantics)."""
    w = hann_window(win_length, dtype)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype)
    out[left : left + win_length] = w
    return out


def hz_to_mel(f, htk: bool = True):
    if htk:
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    # Slaney scale (librosa default) — provided for completeness
    f = np.asarray(f, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m, htk: bool = True):
    if htk:
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    m = np.asarray(m, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    htk: bool = True,
    norm: Optional[str] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank ``[n_freqs, n_mels]`` (torchaudio
    ``melscale_fbanks`` semantics: HTK scale, no normalization by default)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs, dtype=np.float64)
    m_pts = np.linspace(hz_to_mel(f_min, htk), hz_to_mel(f_max, htk), n_mels + 2)
    f_pts = mel_to_hz(m_pts, htk)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(dtype)


def _padded_buffer(
    x: jax.Array, pad: int, extra: int, lengths: Optional[jax.Array]
) -> jax.Array:
    """Build the center-padded signal buffer ``[B, pad + T + pad + extra]``
    with reflection at the LEFT edge (static: all utterances start at 0) and
    at each utterance's TRUE right edge (per-row dynamic slice + scatter —
    O(B * n_fft) work, no large gathers)."""
    b, t = x.shape
    left = jnp.flip(x[:, 1 : pad + 1], axis=-1)  # reflect around sample 0
    if lengths is None:
        right = jnp.flip(x[:, t - pad - 1 : t - 1], axis=-1)
        return jnp.concatenate(
            [left, x, right, jnp.zeros((b, extra), x.dtype)], axis=-1
        )
    buf = jnp.concatenate(
        [left, x, jnp.zeros((b, pad + extra), x.dtype)], axis=-1
    )

    # tail[j] = x[len - 2 - j] for j in [0, pad): reversed slice ending at len-1
    def fix_row(row_buf, row_x, ln):
        start = jnp.clip(ln - 1 - pad, 0, t - pad)
        tail = jnp.flip(jax.lax.dynamic_slice(row_x, (start,), (pad,)), axis=-1)
        # Exact torch.stft reflection for every length torch itself accepts
        # (length >= pad + 1; tested down to that floor in
        # tests/test_frontend.py::test_short_row_padded_batch_matches_solo_torch_stft).
        # For length <= pad — where torch.stft ERRORS outright — the clip
        # yields a clamped reflection instead of crashing (graceful superset,
        # outside the parity surface).
        return jax.lax.dynamic_update_slice(row_buf, tail, (pad + ln,))

    return jax.vmap(fix_row)(buf, x, lengths.astype(jnp.int32))


def _framing_buffer(
    x: jax.Array, n_fft: int, hop_length: int, lengths: Optional[jax.Array]
) -> Tuple[jax.Array, int, int]:
    """Center-reflect-padded buffer covering all frames:
    ``(buf [B, >= (n_frames-1)*hop + k*hop], n_frames, k_slices)``."""
    b, t = x.shape
    pad = n_fft // 2
    assert t > pad, (
        f"input length {t} must exceed n_fft//2={pad} for reflect padding "
        "(same constraint as torch.stft center=True)"
    )
    n_frames = 1 + t // hop_length
    k_slices = -(-n_fft // hop_length)  # ceil
    # buffer must cover (n_frames-1)*hop + k_slices*hop samples
    need = (n_frames - 1 + k_slices) * hop_length
    extra = max(need - (t + 2 * pad), 0)
    return _padded_buffer(x, pad, extra, lengths), n_frames, k_slices


def frame_signal(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Center-reflect-pad then extract frames: ``[B, T] -> [B, F, n_fft]``
    with ``F = 1 + T // hop`` (torch.stft center=True semantics).

    With ``lengths`` (``[B]``), reflection happens at each utterance's TRUE
    right edge rather than the padded batch edge, so a padded batch framed
    here is bit-identical to framing each utterance alone — required for
    exact parity with the reference's per-example frontend
    (src/datasets.py:64-71).

    TPU note: frames are materialized with ``ceil(n_fft / hop)`` contiguous
    strided-slice reshapes of one padded buffer — NOT a ``[B, F, n_fft]``
    index gather, which measures ~50 ms/batch on TPU (random-access loads);
    the slice/concat form is pure sequential memory traffic.
    """
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    else:
        squeeze = False
    buf, n_frames, k_slices = _framing_buffer(x, n_fft, hop_length, lengths)
    b = x.shape[0]
    pieces = [
        buf[:, k * hop_length : (n_frames + k) * hop_length].reshape(
            b, n_frames, hop_length
        )
        for k in range(k_slices)
    ]
    frames = jnp.concatenate(pieces, axis=-1)[..., :n_fft]
    return frames[0] if squeeze else frames


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases ``[n_fft, n_fft//2+1]`` for DFT-as-matmul."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _windowed_dft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed DFT basis as conv filters ``[n_fft, 1, 2 * n_bins]``
    (cos | sin, window folded in) for DFT-as-strided-convolution."""
    cos_m, sin_m = _dft_matrices(n_fft)
    window = padded_window(n_fft, win_length).astype(np.float64)[:, None]
    return np.concatenate(
        [cos_m * window, sin_m * window], axis=1
    ).astype(np.float32)[:, None, :]


def _conv_dft(buf: jax.Array, n_frames: int, cfg: "FrontendConfig", prec):
    """Framing + window + rDFT as ONE strided convolution over the padded
    buffer: ``[B, T_buf] -> (re, im) [B, F, n_bins]``.

    TPU-first: the MXU consumes the overlapping 512-tap windows natively
    (implicit GEMM), so the ``[B, F, n_fft]`` frames tensor — 79 MB at
    B=128/3 s, written AND re-read by the frame+matmul path — never
    materializes in HBM (frontend path measurements: BENCHMARKS.md)."""
    n_bins = cfg.n_fft // 2 + 1
    need = (n_frames - 1) * cfg.hop_length + cfg.n_fft
    filters = jnp.asarray(_windowed_dft_filters(cfg.n_fft, cfg.win_length))
    out = jax.lax.conv_general_dilated(
        buf[:, :need, None],
        filters,
        window_strides=(cfg.hop_length,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=prec,
    )  # [B, F, 2*n_bins]
    return out[..., :n_bins], out[..., n_bins:]


class FrontendConfig(NamedTuple):
    """Static frontend hyper-parameters (reference parameters.yml:79-85:
    sr 16000, n_fft 512, win 25 ms, hop 10 ms, 80 mels)."""

    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400  # samples (25 ms @ 16 kHz)
    hop_length: int = 160  # samples (10 ms @ 16 kHz)
    n_mels: int = 80
    use_matmul_dft: bool = True
    # framing + window + rDFT as ONE strided MXU convolution — the frames
    # tensor never materializes in HBM (see _conv_dft). Parity-tested vs
    # torch.stft like the strided path. Default OFF: the strided-frame +
    # ideal-K GEMM path measures faster at BOTH precisions (bench_frontend:
    # 1.02 vs 1.18 ms 'highest', B=128x3s) and inside the full train step
    # (27.6 vs 28.1 ms/step); conv-DFT remains for HBM-constrained cases
    # (the frames tensor is 79 MB at B=128x3s).
    use_conv_dft: bool = False
    # 'highest' = f32 multi-pass matmuls (torchaudio parity, default);
    # 'default' = MXU bf16 passes (~4x faster frontend, ~5e-2 mel error —
    # fine as training-time noise, not for parity-graded inference)
    precision: str = "highest"
    # Route log_mel_spectrogram through the single fused Pallas kernel
    # (ops/pallas/melspec.py log_mel_spectrogram_pallas_fused): framing,
    # DFT, power, mel, dB and L2-norm in one kernel — frames and spectrum
    # never touch HBM. TPU-only (tests run it in interpret mode); measured
    # vs the XLA paths in bench_frontend.py / BENCHMARKS.md.
    use_pallas_fused: bool = False

    @classmethod
    def from_ms(cls, sample_rate=16000, n_fft=512, win_ms=25, hop_ms=10, n_mels=80, **kw):
        # ms -> samples conversion mirrors reference src/transforms.py:61-62
        return cls(
            sample_rate=sample_rate,
            n_fft=n_fft,
            win_length=int(win_ms / 1000 * sample_rate),
            hop_length=int(hop_ms / 1000 * sample_rate),
            n_mels=n_mels,
            **kw,
        )

    def num_frames(self, num_samples: int) -> int:
        return 1 + num_samples // self.hop_length


def spectrogram(
    waveform: jax.Array,
    cfg: FrontendConfig,
    power: Optional[float] = 2.0,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """``[..., T] -> [..., F, n_bins]`` power (or complex if power=None)
    spectrogram, torch.stft-compatible."""
    # HIGHEST precision by default: TPU's bf16 matmul passes lose ~5e-2
    # after the dB + L2-norm chain; the DFT is parity-critical
    # (SURVEY.md §7). cfg.precision='default' trades that for speed.
    prec = (
        jax.lax.Precision.HIGHEST
        if cfg.precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    if cfg.use_conv_dft:
        x = waveform[None] if waveform.ndim == 1 else waveform
        buf, n_frames, _ = _framing_buffer(x, cfg.n_fft, cfg.hop_length, lengths)
        re, im = _conv_dft(buf, n_frames, cfg, prec)
        if waveform.ndim == 1:
            re, im = re[0], im[0]
        if power is None:
            return re + 1j * im
        p = re * re + im * im
        return p if power == 2.0 else p ** (power / 2.0)
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, lengths=lengths)
    window = jnp.asarray(padded_window(cfg.n_fft, cfg.win_length))
    frames = frames * window
    if cfg.use_matmul_dft and power is not None:
        cos_m, sin_m = _dft_matrices(cfg.n_fft)
        re = jnp.dot(frames, jnp.asarray(cos_m), precision=prec)
        im = jnp.dot(frames, jnp.asarray(sin_m), precision=prec)
        p = re * re + im * im
        if power == 2.0:
            return p
        return p ** (power / 2.0)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    if power is None:
        return spec
    p = jnp.abs(spec) ** 2
    return p if power == 2.0 else p ** (power / 2.0)


def amplitude_to_db(power_spec: jax.Array, amin: float = 1e-10) -> jax.Array:
    """torchaudio AmplitudeToDB (power, ref=1.0, no top_db)."""
    return 10.0 * jnp.log10(jnp.maximum(power_spec, amin))


def l2_normalize_mels(spec_db: jax.Array, eps: float = 1e-12) -> jax.Array:
    """F.normalize over the mel axis (last axis here; reference dim=1 on
    [C, M, T] — src/transforms.py:184)."""
    norm = jnp.linalg.norm(spec_db, axis=-1, keepdims=True)
    return spec_db / jnp.maximum(norm, eps)


_warned_fused_fallback: set = set()


def _warn_fused_fallback(reason: str) -> None:
    """One-time (per distinct reason) warning when ``use_pallas_fused=True``
    silently falls back to the XLA path — so a user who enabled the fast
    frontend sees why it was not taken (ADVICE r2)."""
    if reason not in _warned_fused_fallback:
        _warned_fused_fallback.add(reason)
        import warnings

        warnings.warn(
            f"use_pallas_fused=True but falling back to the XLA frontend: {reason}",
            stacklevel=3,
        )


def log_mel_spectrogram(
    waveform: jax.Array,
    cfg: FrontendConfig,
    lengths: Optional[jax.Array] = None,
    mel_fb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full frontend: ``[B, T] -> ([B, F, n_mels], frames_mask [B, F])``.

    Matches reference MelSpectrogram.__call__ (src/transforms.py:158-184):
    power spectrogram -> mel scale -> dB -> L2-normalize over mels. When
    ``lengths`` is given, frames at/after ``1 + length // hop`` are zeroed
    (identical to reference zero-padded collation, src/datasets.py:64-71).

    ``cfg.use_pallas_fused`` routes through the single fused TPU kernel —
    but only when ``mel_fb`` is None (the kernel builds its own filterbank;
    a caller-supplied ``mel_fb`` forces the XLA path) and the geometry is
    supported (``fused_kernel_supports``; falls back to XLA otherwise).
    """
    if cfg.use_pallas_fused:
        if mel_fb is None:
            # Lazy import: ops.pallas.melspec imports this module.
            from titanet_tpu.ops.pallas.melspec import (
                fused_kernel_supports,
                log_mel_spectrogram_pallas_fused,
            )

            if fused_kernel_supports(cfg):
                return log_mel_spectrogram_pallas_fused(
                    waveform, cfg, lengths=lengths
                )
            _warn_fused_fallback(
                f"geometry unsupported (n_fft={cfg.n_fft} > lcm(hop={cfg.hop_length}, 128))"
            )
        else:
            _warn_fused_fallback(
                "caller-supplied mel_fb forces the XLA path (the kernel builds "
                "its own filterbank)"
            )
    if mel_fb is None:
        mel_fb = jnp.asarray(
            mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
        )
    p = spectrogram(waveform, cfg, power=2.0, lengths=lengths)  # [B, F, bins]
    prec = (
        jax.lax.Precision.HIGHEST
        if cfg.precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    mel = jnp.dot(p, mel_fb.astype(p.dtype), precision=prec)  # [B, F, n_mels]
    mel_db = amplitude_to_db(mel)
    out = l2_normalize_mels(mel_db)
    mask = None
    if lengths is not None:
        n_frames = out.shape[-2]
        frame_ids = jnp.arange(n_frames)[None, :]
        valid = 1 + lengths[:, None] // cfg.hop_length
        mask = (frame_ids < valid).astype(out.dtype)  # [B, F]
        out = out * mask[..., None]
    return out, mask
