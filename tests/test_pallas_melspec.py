"""Fused Pallas mel kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

CFG = FrontendConfig.from_ms()


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_melspec_matches_jnp():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 24000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(wav, CFG)
    out, _ = log_mel_spectrogram_pallas(wav, CFG)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_pallas_melspec_masking():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas

    rng = np.random.default_rng(1)
    wav = np.zeros((2, 24000), np.float32)
    wav[0] = rng.standard_normal(24000) * 0.1
    wav[1, :16000] = rng.standard_normal(16000) * 0.1
    lengths = jnp.asarray([24000, 16000])
    ref, rmask = log_mel_spectrogram(jnp.asarray(wav), CFG, lengths=lengths)
    out, mask = log_mel_spectrogram_pallas(jnp.asarray(wav), CFG, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(rmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)
