"""Augmentation tests: semantics vs torch where possible, properties otherwise."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from titanet_tpu.ops.augment import (
    mask_along_axis,
    phase_vocoder,
    resample,
    reverb,
    spec_augment,
    speed_perturb,
)


def test_mask_along_axis_shape_and_bounds():
    key = jax.random.key(0)
    spec = jnp.ones((80, 100))
    out = np.asarray(mask_along_axis(key, spec, mask_param=0.35 * 80, axis=0))
    zero_rows = np.where((out == 0).all(axis=1))[0]
    assert len(zero_rows) <= int(0.35 * 80)
    if len(zero_rows) > 0:  # contiguous band
        assert (np.diff(zero_rows) == 1).all()
    # non-masked rows untouched
    assert (out[(out != 0).any(axis=1)] == 1).all()


def test_spec_augment_batched_and_gated():
    key = jax.random.key(1)
    spec = jnp.ones((4, 120, 80))
    out = np.asarray(spec_augment(key, spec, probability=1.0))
    assert out.shape == spec.shape
    assert (out == 0).any()  # something was masked
    out_off = np.asarray(spec_augment(key, spec, probability=0.0))
    np.testing.assert_array_equal(out_off, np.asarray(spec))


def test_phase_vocoder_properties():
    rng = np.random.default_rng(0)
    n_freq, n_time, hop, n_fft = 257, 50, 160, 512
    spec = (
        rng.standard_normal((n_freq, n_time)) + 1j * rng.standard_normal((n_freq, n_time))
    ).astype(np.complex64)
    for rate in (0.9, 1.1, 1.25):
        out = phase_vocoder(jnp.asarray(spec), rate, hop, n_fft)
        assert out.shape == (n_freq, math.ceil(n_time / rate))
    # identity at rate 1
    out = phase_vocoder(jnp.asarray(spec), 1.0, hop, n_fft)
    np.testing.assert_array_equal(np.asarray(out), spec)
    # magnitude at integer steps is preserved (alphas=0 -> norm_0)
    out = np.asarray(phase_vocoder(jnp.asarray(spec), 0.5, hop, n_fft))
    np.testing.assert_allclose(np.abs(out[:, 0]), np.abs(spec[:, 0]), rtol=1e-5)


def test_resample_pure_tone():
    # a pure tone resampled 16k -> 8k must stay the same frequency
    sr, f0, dur = 16000, 440.0, 1.0
    t = np.arange(int(sr * dur)) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None]
    y = np.asarray(resample(jnp.asarray(x), sr, 8000))[0]
    assert abs(y.shape[-1] - 8000) <= 1
    # dominant FFT bin
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = spec.argmax() * 8000 / len(y)
    assert abs(peak_hz - f0) < 2.0
    # amplitude preserved within passband
    assert 0.9 < np.abs(y[2000:6000]).max() < 1.1


def test_resample_identity_and_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    same = resample(jnp.asarray(x), 16000, 16000)
    np.testing.assert_array_equal(np.asarray(same), x)
    # upsample then downsample approximates identity (band-limited signal)
    from titanet_tpu.ops.augment import _sinc_resample_kernel  # noqa: F401

    lowpassed = np.asarray(resample(resample(jnp.asarray(x), 16000, 8000), 8000, 16000))
    assert lowpassed.shape == x.shape


def test_speed_perturb_length():
    x = jnp.ones((1, 16000))
    y, n = speed_perturb(x, 16000, 1.05)
    assert abs(n - round(16000 / 1.05)) <= 20
    y, n = speed_perturb(x, 16000, 0.95)
    assert abs(n - round(16000 / 0.95)) <= 20


def test_reverb_matches_reference_conv():
    """Reference reverb: left-pad rir_len-1, conv1d with flipped normalized
    RIR (src/transforms.py:286-296). Compare against torch conv1d."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    rir = rng.standard_normal(300).astype(np.float32)

    rir_t = torch.from_numpy(rir)[None]
    rir_t = rir_t / torch.norm(rir_t, p=2)
    rir_t = torch.flip(rir_t, [1])
    padded = torch.nn.functional.pad(torch.from_numpy(x), (rir_t.shape[1] - 1, 0))
    ref = torch.nn.functional.conv1d(padded[None], rir_t[None])[0].numpy()

    ours = np.asarray(reverb(jnp.asarray(x), jnp.asarray(rir)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)
