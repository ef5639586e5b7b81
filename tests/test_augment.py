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


# ---------------------------------------------------------------------------
# SpecAugment time stretch (reference src/transforms.py:167-178)
# ---------------------------------------------------------------------------


def _torch_vocoder_magnitude(spec: np.ndarray, rate: float) -> np.ndarray:
    """Magnitude path of torchaudio.functional.phase_vocoder (transcribed
    from the documented algorithm): mag[j] = a*|s[idx+1]| + (1-a)*|s[idx]|
    with idx = floor(j*rate), two trailing zero-pad frames, output length
    ceil(n_time / rate). Phases cancel in the reference pipeline because it
    takes .abs().pow(2) immediately after stretching."""
    n_time = spec.shape[-1]
    time_steps = np.arange(0, n_time, rate)
    alphas = time_steps % 1.0
    spec_pad = np.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, 2)])
    idx = time_steps.astype(np.int64)
    n0 = np.abs(spec_pad[..., idx])
    n1 = np.abs(spec_pad[..., idx + 1])
    return alphas * n1 + (1.0 - alphas) * n0


def test_stretch_interp_matrix_matches_vocoder_magnitude():
    from titanet_tpu.ops.augment import stretch_interp_matrix

    rng = np.random.default_rng(0)
    n_freq, n_time = 257, 101
    spec = (
        rng.standard_normal((n_freq, n_time)) + 1j * rng.standard_normal((n_freq, n_time))
    ).astype(np.complex64)
    amp = np.abs(spec).astype(np.float32)  # [freq, time]
    for rate in (0.9, 0.95, 1.0, 1.05, 1.13):
        ref = _torch_vocoder_magnitude(spec, rate)  # [freq, ceil(T/rate)]
        w = np.asarray(stretch_interp_matrix(n_time, jnp.float32(rate)))
        ours = (w @ np.pad(amp, ((0, 0), (0, 2))).T).T  # [freq, n_time]
        n_out = ref.shape[-1]
        k = min(n_out, n_time)
        np.testing.assert_allclose(ours[:, :k], ref[:, :k], rtol=1e-4, atol=1e-5)


def test_log_mel_specaugment_gate_off_equals_plain():
    from titanet_tpu.ops.augment import AugmentConfig, log_mel_specaugment
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    cfg = FrontendConfig.from_ms()
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    lengths = jnp.asarray([16000, 12000], jnp.int32)
    plain, mask = log_mel_spectrogram(wav, cfg, lengths=lengths)
    aug = AugmentConfig(probability=0.0)
    out, mask2 = jax.jit(
        lambda k, w, l: log_mel_specaugment(k, w, cfg, aug, lengths=l)
    )(jax.random.key(0), wav, lengths)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))
    # gate off -> rate 1.0 -> identity interp matrix; only the sqrt->square
    # round trip differs from the plain power path (the reference itself
    # does abs().pow(2), the same round trip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=2e-4)


def test_log_mel_specaugment_padded_batch_matches_solo_stretch():
    """A padded batch row stretched at a fixed rate must equal the solo
    (exact-length) pipeline: power spec -> vocoder magnitude -> square ->
    mel -> dB -> L2 norm, then zero-pad (the reference stretches each
    utterance alone before collation)."""
    from titanet_tpu.ops.augment import AugmentConfig, log_mel_specaugment
    from titanet_tpu.ops.frontend import (
        FrontendConfig,
        amplitude_to_db,
        l2_normalize_mels,
        mel_filterbank,
        log_mel_spectrogram,
        spectrogram,
    )

    cfg = FrontendConfig.from_ms()
    rate = 1.05
    rng = np.random.default_rng(2)
    t_full, t_short = 16000, 11200
    wav_full = rng.standard_normal(t_full).astype(np.float32) * 0.1
    wav_short = wav_full[:t_short]
    batch = np.zeros((2, t_full), np.float32)
    batch[0] = wav_full
    batch[1, :t_short] = wav_short
    lengths = jnp.asarray([t_full, t_short], jnp.int32)

    aug = AugmentConfig(
        min_rate=rate, max_rate=rate, probability=1.0,
        freq_mask_num=0, time_mask_num=0,
    )
    out, mask = jax.jit(
        lambda k, w, l: log_mel_specaugment(k, w, cfg, aug, lengths=l)
    )(jax.random.key(3), jnp.asarray(batch), lengths)
    out = np.asarray(out)
    mel_fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)

    for row, wav in ((0, wav_full), (1, wav_short)):
        p_solo = np.asarray(spectrogram(jnp.asarray(wav[None]), cfg, power=2.0))[0]
        mag = _torch_vocoder_magnitude(np.sqrt(p_solo).T, rate).T  # [F', bins]
        mel = (mag**2) @ mel_fb
        ref = np.asarray(l2_normalize_mels(amplitude_to_db(jnp.asarray(mel))))
        n_out = ref.shape[0]
        assert int(np.asarray(mask)[row].sum()) == n_out
        np.testing.assert_allclose(out[row, :n_out], ref, rtol=1e-4, atol=1e-4)
        assert np.all(out[row, n_out:] == 0.0)


def test_train_step_with_augment_config():
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import TitaNet
    from titanet_tpu.ops.augment import AugmentConfig
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer, train_step

    frontend = FrontendConfig.from_ms()
    model = TitaNet(
        n_mega_blocks=1, encoder_hidden_size=16, encoder_output_size=24,
        embedding_size=8, attention_hidden_size=4, dropout=0.0,
    )
    head = build_head("ce", 8, 4)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((4, 16000)) * 0.1, jnp.float32)
    lengths = jnp.asarray([16000, 12000, 16000, 9000], jnp.int32)
    spk = jnp.asarray([0, 1, 2, 3], jnp.int32)
    aug = AugmentConfig(probability=0.5)
    state, metrics = train_step(
        state, wav, lengths, spk, model=model, head=head, optimizer=opt,
        frontend=frontend, augment=aug,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_add_noise_snr_exact():
    from titanet_tpu.ops.augment import add_noise

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((4, 16000)) * 0.3, jnp.float32)
    out = add_noise(jax.random.key(1), wav, probability=1.0,
                    snr_min=10.0, snr_max=10.0)
    noise = np.asarray(out) - np.asarray(wav)
    snr_db = 10 * np.log10(
        np.mean(np.square(np.asarray(wav)), -1) / np.mean(np.square(noise), -1)
    )
    np.testing.assert_allclose(snr_db, 10.0, atol=1e-3)


def test_add_noise_gate_and_padding():
    from titanet_tpu.ops.augment import add_noise

    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 8000)) * 0.2, jnp.float32)
    # probability 0 -> identity
    out = add_noise(jax.random.key(0), wav, probability=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(wav))
    # padded samples stay exactly zero
    lengths = jnp.asarray([5000, 8000], jnp.int32)
    wav_pad = np.asarray(wav).copy()
    wav_pad[0, 5000:] = 0.0
    out = add_noise(jax.random.key(2), jnp.asarray(wav_pad), lengths,
                    probability=1.0, snr_min=5.0, snr_max=20.0)
    assert np.all(np.asarray(out)[0, 5000:] == 0.0)
    assert not np.allclose(np.asarray(out)[0, :5000], wav_pad[0, :5000])


def test_add_noise_pink_spectrum():
    from titanet_tpu.ops.augment import add_noise

    wav = jnp.zeros((1, 16384), jnp.float32).at[:, 0].set(1.0)  # unit power ref
    out = add_noise(jax.random.key(3), wav, probability=1.0,
                    snr_min=0.0, snr_max=0.0, color="pink")
    noise = np.asarray(out) - np.asarray(wav)
    spec = np.abs(np.fft.rfft(noise[0])) ** 2
    lo = spec[1:100].mean()
    hi = spec[-100:].mean()
    assert lo > 10 * hi  # 1/f power: low band dominates


def test_train_step_with_noise_augmentation():
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_xvector
    from titanet_tpu.ops.augment import AugmentConfig
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import train_step

    model = get_xvector(hidden_size=32, frame_out=64)
    head = build_head("ce", 192, 4)
    opt = make_optimizer(start_lr=1e-3)
    frontend = FrontendConfig.from_ms()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    wav = jnp.asarray(
        np.random.default_rng(4).standard_normal((4, 16000)) * 0.1, jnp.float32
    )
    spk = jnp.asarray([0, 1, 2, 3], jnp.int32)
    # noise-only config (specaugment disabled)
    aug = AugmentConfig(specaugment=False, noise_prob=1.0)
    state, metrics = train_step(
        state, wav, None, spk, model=model, head=head, optimizer=opt,
        frontend=frontend, augment=aug,
    )
    assert np.isfinite(float(metrics["loss"]))
    # noise + specaugment together
    aug2 = AugmentConfig(noise_prob=0.5)
    state, metrics = train_step(
        state, wav, None, spk, model=model, head=head, optimizer=opt,
        frontend=frontend, augment=aug2,
    )
    assert np.isfinite(float(metrics["loss"]))
