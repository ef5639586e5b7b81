"""On-device audio augmentations.

Device-side, batched, PRNG-key-driven rebuilds of the reference's per-example
CPU transforms (``/root/reference/src/transforms.py``):

- SpecAugment freq/time masking (torchaudio ``mask_along_axis`` semantics,
  reference usage src/transforms.py:186-201),
- time-stretch phase vocoder (torchaudio ``TimeStretch``/``phase_vocoder``,
  reference src/transforms.py:154-156,167-175),
- sinc-interpolation resampling (torchaudio ``functional.resample`` algorithm:
  hann-windowed sinc, lowpass_filter_width=6, rolloff=0.99; reference
  src/transforms.py:320-341),
- speed perturbation built on resampling (reference uses sox
  ``speed``+``rate``, src/transforms.py:78-108; resample-based speed is the
  standard equivalent),
- convolution reverb (reference src/transforms.py:270-298) via FFT.

Everything is jit-safe with static shapes; randomness comes from explicit
PRNG keys (one per batch, split per example).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SpecAugment masking
# ---------------------------------------------------------------------------


def mask_along_axis(
    key: jax.Array,
    spec: jax.Array,
    mask_param,
    axis: int,
    mask_value: float = 0.0,
    size=None,
) -> jax.Array:
    """torchaudio ``mask_along_axis`` semantics for a single example:
    ``width ~ U(0, mask_param)``, ``start ~ U(0, size - width)``, zero out
    ``[int(start), int(start+width))`` along ``axis``.

    ``mask_param`` and ``size`` may be traced scalars: with per-row valid
    frame counts, the mask is drawn over the row's TRUE extent — matching
    the reference's per-example (pre-collation) masking
    (src/transforms.py:186-201), where the time-mask width scales with the
    utterance's own frame count, not the padded batch length."""
    dim = spec.shape[axis]
    if size is None:
        size = dim
    k1, k2 = jax.random.split(key)
    value = jax.random.uniform(k1) * mask_param
    min_value = jax.random.uniform(k2) * (size - value)
    start = min_value.astype(jnp.int32)
    end = (min_value + value).astype(jnp.int32)
    ids = jnp.arange(dim)
    mask = (ids >= start) & (ids < end)
    shape = [1] * spec.ndim
    shape[axis] = dim
    return jnp.where(mask.reshape(shape), mask_value, spec)


def spec_augment(
    key: jax.Array,
    spec: jax.Array,
    freq_mask_ratio: float = 0.35,
    freq_mask_num: int = 1,
    time_mask_ratio: float = 0.15,
    time_mask_num: int = 1,
    probability: float = 1.0,
    frames_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched SpecAugment masking on ``[B, F, M]`` log-mel spectrograms.

    Mask widths follow the reference: ``ratio * dim_size``
    (src/transforms.py:188-201). The whole augment is gated per example with
    ``probability`` (reference applies SpecAugment as a unit, gated at
    src/transforms.py:168). Time-mask width scales with the padded frame
    count, as in the reference (it masks after collation-equivalent compute).
    """
    b, n_frames, n_mels = spec.shape
    freq_param = freq_mask_ratio * n_mels
    time_param = time_mask_ratio * n_frames

    def one(key, s):
        k_gate, key = jax.random.split(key)
        augmented = s
        for _ in range(freq_mask_num):
            key, k = jax.random.split(key)
            augmented = mask_along_axis(k, augmented, freq_param, axis=1)
        for _ in range(time_mask_num):
            key, k = jax.random.split(key)
            augmented = mask_along_axis(k, augmented, time_param, axis=0)
        apply = jax.random.uniform(k_gate) < probability
        return jnp.where(apply, augmented, s)

    keys = jax.random.split(key, b)
    out = jax.vmap(one)(keys, spec)
    if frames_mask is not None:
        out = out * frames_mask[..., None]
    return out


# ---------------------------------------------------------------------------
# Phase vocoder (time stretch)
# ---------------------------------------------------------------------------


def phase_vocoder(
    spec: jax.Array, rate: float, hop_length: int, n_fft: int
) -> jax.Array:
    """torchaudio ``phase_vocoder``: stretch a complex spectrogram
    ``[..., freq, time]`` by ``rate`` (static Python float; output time is
    ``ceil(time / rate)``).

    Reference applies this inside MelSpectrogram for SpecAugment speed
    (src/transforms.py:154-156,173-175).
    """
    if rate == 1.0:
        return spec
    n_freq, n_time = spec.shape[-2], spec.shape[-1]
    phi_advance = jnp.linspace(0, math.pi * hop_length, n_freq)[..., None]

    time_steps = jnp.arange(0, n_time, rate)  # static length
    alphas = time_steps % 1.0
    spec_pad = jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, 2)])

    idx = time_steps.astype(jnp.int32)
    spec_0 = spec_pad[..., idx]
    spec_1 = spec_pad[..., idx + 1]

    angle_0 = jnp.angle(spec_0)
    angle_1 = jnp.angle(spec_1)
    norm_0 = jnp.abs(spec_0)
    norm_1 = jnp.abs(spec_1)

    phase = angle_1 - angle_0 - phi_advance
    phase = phase - 2.0 * math.pi * jnp.round(phase / (2.0 * math.pi))
    phase = phase + phi_advance
    # accumulate, starting from the first frame's phase
    phase = jnp.concatenate([angle_0[..., :1], phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)

    mag = alphas * norm_1 + (1.0 - alphas) * norm_0
    return mag * jnp.exp(1j * phase_acc)


class AugmentConfig(NamedTuple):
    """SpecAugment hyper-parameters (reference MelSpectrogram kwargs,
    src/transforms.py:118-156 / get_transforms src/transforms.py:58-72).
    Hashable static argument for the jitted train step."""

    min_rate: float = 0.95  # reference specaugment_min_speed
    max_rate: float = 1.05  # reference specaugment_max_speed
    freq_mask_ratio: float = 0.35
    freq_mask_num: int = 1
    time_mask_ratio: float = 0.15
    time_mask_num: int = 1
    probability: float = 1.0
    time_stretch: bool = True
    # False = skip the stretch+masking path entirely (noise-only configs)
    specaugment: bool = True
    # additive noise at a random SNR (beyond the reference, which has no
    # noise augmentation; the standard speaker-verification recipe adds
    # MUSAN noise — with zero egress, PRNG-synthesized white/pink noise is
    # the in-image equivalent). 0.0 = off.
    noise_prob: float = 0.0
    noise_snr_min: float = 5.0  # dB
    noise_snr_max: float = 20.0  # dB
    noise_color: str = "white"  # "white" | "pink"


def stretch_interp_matrix(n_time: int, rate, dtype=jnp.float32) -> jax.Array:
    """``[n_time, n_time + 2]`` banded linear-interpolation matrix ``W`` such
    that ``W @ S_pad`` equals torchaudio ``phase_vocoder``'s magnitude path
    with a FIXED output length: row ``j`` holds ``1 - alpha_j`` at column
    ``idx_j = floor(j * rate)`` and ``alpha_j = j*rate % 1`` at ``idx_j + 1``
    (``S_pad`` carries torch's two trailing zero-pad frames). ``rate`` may be
    a traced scalar, so a per-example continuous random rate jits with static
    shapes — rows past ``ceil(valid / rate)`` read the zero pad and must be
    masked by the caller.

    TPU note: expressing the resample as a matmul keeps it on the MXU; an
    index gather along time measures ~25x slower on TPU.
    """
    steps = jnp.arange(n_time, dtype=dtype) * rate
    alphas = steps % 1.0
    idx = jnp.minimum(steps.astype(jnp.int32), n_time)  # clamp into zero pad
    cols = jnp.arange(n_time + 2)
    w0 = (cols[None, :] == idx[:, None]) * (1.0 - alphas)[:, None]
    w1 = (cols[None, :] == (idx + 1)[:, None]) * alphas[:, None]
    return (w0 + w1).astype(dtype)


def log_mel_specaugment(
    key: jax.Array,
    waveform: jax.Array,
    frontend_cfg,
    aug: AugmentConfig,
    lengths: Optional[jax.Array] = None,
    mel_fb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full training frontend with SpecAugment: ``[B, T] ->
    ([B, F, n_mels], frames_mask [B, F])``.

    Rebuild of the reference MelSpectrogram.__call__ WITH specaugment enabled
    (src/transforms.py:158-201): ONE per-example gate ``u < probability``
    turns on BOTH the time stretch (continuous rate ~ U(min, max) applied to
    the complex spectrogram, src/transforms.py:167-175) and the freq/time
    masking after dB + normalize (src/transforms.py:186-201).

    The reference squares the stretched spectrogram's magnitude immediately
    (``.abs().pow(2)``, src/transforms.py:178), so the vocoder's phase
    accumulation cancels out of the final mel output; the stretch reduces
    EXACTLY to linear interpolation of frame magnitudes —
    ``alpha*|s1| + (1-alpha)*|s0|`` — implemented here as one banded matmul
    per example (:func:`stretch_interp_matrix`). Time-mask widths and starts
    use each row's TRUE (post-stretch) frame count, as the reference masks
    per example before collation.
    """
    from titanet_tpu.ops.frontend import (
        amplitude_to_db,
        l2_normalize_mels,
        mel_filterbank,
        spectrogram,
    )

    cfg = frontend_cfg
    if mel_fb is None:
        mel_fb = jnp.asarray(
            mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
        )
    prec = (
        jax.lax.Precision.HIGHEST
        if cfg.precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    p = spectrogram(waveform, cfg, power=2.0, lengths=lengths)  # [B, F, bins]
    b, n_frames, _ = p.shape
    if lengths is not None:
        valid = (1 + lengths // cfg.hop_length).astype(jnp.int32)
    else:
        valid = jnp.full((b,), n_frames, jnp.int32)
    frame_ids = jnp.arange(n_frames)

    def stretch_one(key, p_row, v):
        k_gate, k_rate, k_mask = jax.random.split(key, 3)
        gate = jax.random.uniform(k_gate) < aug.probability
        rate = jnp.where(
            gate,
            jax.random.uniform(k_rate, minval=aug.min_rate, maxval=aug.max_rate),
            1.0,
        )
        if aug.time_stretch:
            # reference .abs() then stretch: interpolate amplitudes, square
            amp = jnp.sqrt(p_row) * (frame_ids < v)[:, None].astype(p_row.dtype)
            w = stretch_interp_matrix(n_frames, rate, amp.dtype)
            amp = jnp.dot(
                w, jnp.pad(amp, ((0, 2), (0, 0))), precision=jax.lax.Precision.HIGHEST
            )
            p_out = amp * amp
            new_v = jnp.minimum(
                jnp.ceil(v.astype(jnp.float32) / rate).astype(jnp.int32), n_frames
            )
        else:
            p_out, new_v = p_row, v
        return p_out, new_v, gate, k_mask

    keys = jax.random.split(key, b)
    p, new_valid, gates, mask_keys = jax.vmap(stretch_one)(keys, p, valid)
    mel = jnp.dot(p, mel_fb.astype(p.dtype), precision=prec)
    out = l2_normalize_mels(amplitude_to_db(mel))  # [B, F, n_mels]
    n_mels = out.shape[-1]

    def mask_one(key, s, v, gate):
        masked = s
        for _ in range(aug.freq_mask_num):
            key, k = jax.random.split(key)
            masked = mask_along_axis(k, masked, aug.freq_mask_ratio * n_mels, axis=1)
        time_param = aug.time_mask_ratio * v
        for _ in range(aug.time_mask_num):
            key, k = jax.random.split(key)
            masked = mask_along_axis(k, masked, time_param, axis=0, size=v)
        return jnp.where(gate, masked, s)

    out = jax.vmap(mask_one)(mask_keys, out, new_valid, gates)
    mask = (frame_ids[None, :] < new_valid[:, None]).astype(out.dtype)
    return out * mask[..., None], mask


# ---------------------------------------------------------------------------
# Resampling (sinc interpolation) and speed perturbation
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """torchaudio ``_get_sinc_resample_kernel`` (sinc_interp_hann):
    returns (kernels [new_freq_g, 1, K], width)."""
    gcd = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, None] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale
    return kernels.astype(np.float32), width


def resample(
    waveform: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """torchaudio ``functional.resample`` for ``[B, T]`` waveforms."""
    if orig_freq == new_freq:
        return waveform
    gcd = math.gcd(orig_freq, new_freq)
    of, nf = orig_freq // gcd, new_freq // gcd
    kernels, width = _sinc_resample_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    length = waveform.shape[-1]
    x = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(width, width + of)])
    # conv: [B, T, 1] x [K, 1, new_freq_g] stride of
    out = jax.lax.conv_general_dilated(
        x[..., None],
        jnp.asarray(kernels.transpose(2, 1, 0)),
        window_strides=(of,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, T//of, nf]
    out = out.reshape(out.shape[0], -1)  # interleave polyphase outputs
    target_length = int(math.ceil(nf * length / of))
    return out[..., :target_length]


def speed_perturb(
    waveform: jax.Array, sample_rate: int, speed: float
) -> Tuple[jax.Array, int]:
    """Speed change by resampling (sox ``speed`` + ``rate`` equivalent,
    reference src/transforms.py:78-108): output has ``round(T / speed)``
    samples at the same sample rate. ``speed`` is a static Python float."""
    new_freq = int(round(sample_rate / speed))
    out = resample(waveform, sample_rate, new_freq)
    return out, out.shape[-1]


# ---------------------------------------------------------------------------
# Convolution reverb
# ---------------------------------------------------------------------------


def reverb(
    waveform: jax.Array, rir: jax.Array, normalize_rir: bool = True
) -> jax.Array:
    """Convolve ``[B, T]`` waveforms with a room impulse response ``[L]``.

    Matches the reference exactly (src/transforms.py:270-298): RIR is
    power-normalized, the signal is left-padded by L-1 and convolved so the
    output keeps length T (causal convolution truncated to T). FFT-based —
    O(T log T) instead of the reference's O(T*L) direct conv.
    """
    if normalize_rir:
        rir = rir / jnp.linalg.norm(rir)
    t = waveform.shape[-1]
    l = rir.shape[-1]
    n = 1
    while n < t + l - 1:
        n *= 2
    wf = jnp.fft.rfft(waveform, n=n)
    rf = jnp.fft.rfft(rir, n=n)
    full = jnp.fft.irfft(wf * rf, n=n)
    return full[..., :t].astype(waveform.dtype)


# ---------------------------------------------------------------------------
# Additive noise
# ---------------------------------------------------------------------------


def add_noise(
    key: jax.Array,
    waveform: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    probability: float = 1.0,
    snr_min: float = 5.0,
    snr_max: float = 20.0,
    color: str = "white",
) -> jax.Array:
    """Per-example gated additive noise at ``SNR ~ U(snr_min, snr_max)`` dB.

    Beyond the reference (which has no noise augmentation); the standard
    speaker-verification recipe mixes MUSAN noise/music/babble — with zero
    egress this is the PRNG-synthesized equivalent: ``white`` Gaussian or
    ``pink`` (1/f power, shaped in the frequency domain with one batched
    rFFT). Batched ``[B, T]``, jit-safe, fully on device; noise power is
    matched to each example's measured power over its VALID samples, and
    padded samples stay exactly zero so downstream frame masks/statistics
    are unaffected.
    """
    b, t = waveform.shape
    k_gate, k_snr, k_noise = jax.random.split(key, 3)
    wf = waveform.astype(jnp.float32)
    gate = jax.random.uniform(k_gate, (b,)) < probability
    snr_db = jax.random.uniform(
        k_snr, (b,), minval=snr_min, maxval=snr_max
    )
    noise = jax.random.normal(k_noise, (b, t), jnp.float32)
    if color == "pink":
        freqs = jnp.fft.rfftfreq(t)
        shape = jnp.where(freqs > 0, 1.0 / jnp.sqrt(jnp.maximum(freqs, 1e-12)), 0.0)
        noise = jnp.fft.irfft(jnp.fft.rfft(noise, axis=-1) * shape, t, axis=-1)
    elif color != "white":
        raise ValueError(f"unknown noise color {color!r}")
    if lengths is not None:
        valid = (
            jnp.arange(t)[None, :] < lengths[:, None]
        ).astype(jnp.float32)
        n = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    else:
        valid = jnp.ones((b, t), jnp.float32)
        n = jnp.full((b,), float(t), jnp.float32)
    sig_pow = jnp.sum(jnp.square(wf) * valid, axis=-1) / n
    noise_pow = jnp.sum(jnp.square(noise) * valid, axis=-1) / n
    target = sig_pow / jnp.power(10.0, snr_db / 10.0)
    gain = jnp.sqrt(target / jnp.maximum(noise_pow, 1e-12))
    gain = jnp.where(gate, gain, 0.0)
    out = wf + noise * gain[:, None] * valid
    return out.astype(waveform.dtype)
