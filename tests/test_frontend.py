"""Frontend parity tests.

STFT is checked against torch.stft (the exact op torchaudio's Spectrogram
wraps). The mel filterbank is checked against an independent numpy
transcription of torchaudio's documented melscale_fbanks algorithm plus
structural properties. The full chain is checked for shape/mask semantics
matching the reference collation.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from titanet_tpu.ops.frontend import (
    FrontendConfig,
    amplitude_to_db,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    spectrogram,
)

CFG = FrontendConfig.from_ms()  # 16 kHz, n_fft 512, 25/10 ms, 80 mels


def _wave(batch=2, seconds=1.5, seed=0):
    rng = np.random.default_rng(seed)
    t = int(seconds * CFG.sample_rate)
    return (rng.standard_normal((batch, t)) * 0.1).astype(np.float32)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(400), torch.hann_window(400).numpy(), rtol=1e-6, atol=1e-7
    )


def test_power_spectrogram_matches_torch_stft():
    x = _wave()
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    ref_power = ref.abs().pow(2).numpy()  # [B, bins, F]

    for use_conv, use_matmul in ((True, True), (False, True), (False, False)):
        cfg = CFG._replace(use_conv_dft=use_conv, use_matmul_dft=use_matmul)
        ours = np.asarray(spectrogram(jnp.asarray(x), cfg, power=2.0))  # [B, F, bins]
        np.testing.assert_allclose(
            ours.transpose(0, 2, 1), ref_power, rtol=1e-3, atol=1e-5,
            err_msg=f"conv={use_conv} matmul={use_matmul}",
        )
    # complex output of the conv path matches torch.stft too
    cplx = np.asarray(
        spectrogram(jnp.asarray(x), CFG._replace(use_conv_dft=True), power=None)
    )
    np.testing.assert_allclose(
        cplx.transpose(0, 2, 1), ref.numpy(), rtol=1e-3, atol=1e-4,
    )


@pytest.mark.parametrize(
    "n_fft,win_ms,hop_ms,sr",
    [
        (256, 16, 8, 16000),   # small FFT, win == n_fft
        (1024, 50, 25, 16000),  # large FFT, win < n_fft
        (512, 20, 12, 16000),   # hop not a divisor of win
        (400, 25, 10, 8000),    # non-power-of-two FFT, 8 kHz
    ],
)
def test_spectrogram_matches_torch_stft_other_geometries(n_fft, win_ms, hop_ms, sr):
    """Geometry fuzz: the framing/DFT paths must track torch.stft for
    arbitrary (n_fft, win, hop, sample_rate) — not just the TitaNet default
    — since the frontend config is fully user-settable (audio.spectrogram).
    Covers both the strided-GEMM and conv-DFT implementations."""
    cfg = FrontendConfig.from_ms(
        sample_rate=sr, n_fft=n_fft, win_ms=win_ms, hop_ms=hop_ms
    )
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, int(1.1 * sr))) * 0.1).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs().pow(2).numpy()  # [B, bins, F]
    for use_conv in (False, True):
        cfg_i = cfg._replace(use_conv_dft=use_conv)
        ours = np.asarray(spectrogram(jnp.asarray(x), cfg_i, power=2.0))
        np.testing.assert_allclose(
            ours.transpose(0, 2, 1), ref, rtol=1e-3, atol=1e-5,
            err_msg=f"n_fft={n_fft} win={cfg.win_length} hop={cfg.hop_length} "
                    f"sr={sr} conv={use_conv}",
        )


def test_frame_count_matches_torch():
    for t in (16000, 24000, 32000, 48000, 16001, 15999):
        x = _wave(1, t / CFG.sample_rate)
        x = x[:, :t]
        ref = torch.stft(
            torch.from_numpy(x), n_fft=512, hop_length=160, win_length=400,
            window=torch.hann_window(400), center=True, return_complex=True,
        )
        frames = frame_signal(jnp.asarray(x), 512, 160)
        assert frames.shape[-2] == ref.shape[-1] == CFG.num_frames(t)


def _melscale_fbanks_numpy(n_freqs, f_min, f_max, n_mels, sample_rate):
    """Independent transcription of torchaudio.functional.melscale_fbanks
    (HTK scale, norm=None) used as the test oracle."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = 2595.0 * np.log10(1.0 + (f_min / 700.0))
    m_max = 2595.0 * np.log10(1.0 + (f_max / 700.0))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    zero = np.zeros(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(zero, np.minimum(down_slopes, up_slopes))
    return fb


def test_mel_filterbank_matches_torchaudio_algorithm():
    fb = mel_filterbank(257, 80, 16000)
    ref = _melscale_fbanks_numpy(257, 0.0, 8000.0, 80, 16000)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-7)
    # structural checks
    assert fb.shape == (257, 80)
    assert (fb >= 0).all() and fb.max() <= 1.0
    # each filter is nonempty and unimodal triangles cover increasing bins
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_amplitude_to_db_matches_torch_semantics():
    x = np.abs(_wave(1, 0.1)) + 1e-12
    ref = 10.0 * torch.log10(torch.clamp(torch.from_numpy(x), min=1e-10))
    ours = np.asarray(amplitude_to_db(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_log_mel_shapes_and_padding_semantics():
    # two utterances of different lengths in one padded batch
    t1, t2 = 24000, 16000
    x = np.zeros((2, t1), np.float32)
    x[0] = _wave(1, t1 / 16000, seed=1)[0]
    x[1, :t2] = _wave(1, t2 / 16000, seed=2)[0, :t2]
    lengths = jnp.asarray([t1, t2])

    out, mask = log_mel_spectrogram(jnp.asarray(x), CFG, lengths=lengths)
    assert out.shape == (2, CFG.num_frames(t1), 80)
    n2 = CFG.num_frames(t2)
    # valid frames are unit-L2 over mels; padded frames are exactly zero
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms[0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(norms[1, :n2], 1.0, rtol=1e-4)
    assert (np.asarray(out)[1, n2:] == 0).all()
    assert np.asarray(mask)[1, n2:].sum() == 0

    # parity with per-example computation (reference computes each utterance
    # separately then zero-pads: src/datasets.py:64-71)
    solo, _ = log_mel_spectrogram(jnp.asarray(x[1:2, :t2]), CFG)
    np.testing.assert_allclose(
        np.asarray(out)[1, :n2], np.asarray(solo)[0], rtol=1e-4, atol=1e-5
    )


def test_short_row_padded_batch_matches_solo_torch_stft():
    """Per-row lengths down to n_fft//2 + 1 (torch.stft's own floor for
    center=True reflect padding) in a padded batch must match each row's
    SOLO torch.stft. Rows <= n_fft//2 raise in torch; ours produce a
    clamped-reflection superset and are excluded from the parity surface
    (see frontend._padded_buffer)."""
    rng = np.random.default_rng(11)
    t_batch = 1600
    lengths = [1600, 400, 290, 257]  # 257 = n_fft//2 + 1: torch's minimum
    batch = np.zeros((len(lengths), t_batch), np.float32)
    rows = []
    for i, ln in enumerate(lengths):
        row = (rng.standard_normal(ln) * 0.3).astype(np.float32)
        rows.append(row)
        batch[i, :ln] = row

    ours = np.asarray(
        spectrogram(
            jnp.asarray(batch), CFG, power=2.0,
            lengths=jnp.asarray(lengths, jnp.int32),
        )
    )  # [B, F, bins]
    for i, (ln, row) in enumerate(zip(lengths, rows)):
        ref = torch.stft(
            torch.from_numpy(row)[None],
            n_fft=CFG.n_fft, hop_length=CFG.hop_length,
            win_length=CFG.win_length,
            window=torch.hann_window(CFG.win_length),
            center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        ref_power = ref.abs().pow(2).numpy()[0]  # [bins, F_solo]
        n_frames = ref_power.shape[-1]
        assert n_frames == 1 + ln // CFG.hop_length
        np.testing.assert_allclose(
            ours[i, :n_frames].T, ref_power, rtol=1e-3, atol=1e-5,
            err_msg=f"row {i} length {ln}",
        )


def test_torch_stft_rejects_rows_at_or_below_pad():
    """Documents the reference's own floor: torch.stft(center=True) errors
    for utterances <= n_fft//2 samples, so such rows are outside the parity
    surface (the reference pipeline would crash on them)."""
    row = torch.zeros(1, CFG.n_fft // 2)
    with pytest.raises(RuntimeError):
        torch.stft(
            row, n_fft=CFG.n_fft, hop_length=CFG.hop_length,
            win_length=CFG.win_length,
            window=torch.hann_window(CFG.win_length),
            center=True, pad_mode="reflect", return_complex=True,
        )
