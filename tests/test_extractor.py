"""SpeakerEmbedder: bucketing, order preservation, long-audio windowing."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.models import DumbConvNet, l2_normalize
from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
from titanet_tpu.train.extractor import SpeakerEmbedder, geometric_buckets


def _embedder(buckets, batch_size=4):
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    cfg = FrontendConfig.from_ms()
    mel0, _ = log_mel_spectrogram(jnp.zeros((1, 16000)), cfg)
    variables = jax.jit(model.init)(jax.random.key(0), mel0)
    return model, cfg, SpeakerEmbedder(
        model, variables["params"], variables.get("batch_stats", {}),
        frontend=cfg, buckets=buckets, batch_size=batch_size,
    )


def test_geometric_buckets():
    b = geometric_buckets(16000, 480000, 1.5)
    assert b[0] == 16000 and b[-1] >= 480000
    assert len(b) < 12


def test_embed_mixed_lengths_order_and_parity():
    model, cfg, emb = _embedder(buckets=[16000, 24000, 48000])
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (12000, 47000, 16000, 30000, 8000)]
    out = emb.embed(wavs)
    assert out.shape == (5, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # parity with direct single-utterance embedding
    for i, w in enumerate(wavs):
        mel, _ = log_mel_spectrogram(jnp.asarray(w)[None], cfg)
        direct = np.asarray(l2_normalize(model.apply(
            {"params": emb.params, "batch_stats": emb.batch_stats}, mel, train=False
        )))[0]
        np.testing.assert_allclose(out[i], direct, rtol=1e-4, atol=1e-5)


def test_long_audio_windowing():
    model, cfg, emb = _embedder(buckets=[16000, 32000])
    rng = np.random.default_rng(1)
    long = rng.standard_normal(100000).astype(np.float32) * 0.1
    out = emb.embed([long])
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # windowed-average differs from a truncated single window
    truncated = emb.embed([long[:32000]])
    assert not np.allclose(out, truncated, atol=1e-5)


def test_warmup_compiles():
    _, _, emb = _embedder(buckets=[16000, 24000], batch_size=2)
    emb.warmup()  # no error; subsequent embeds hit the jit cache
    out = emb.embed([np.zeros(20000, np.float32)])
    assert out.shape == (1, 8)


def test_quantized_embedder_matches_f32():
    from titanet_tpu.models import TitaNet

    model = TitaNet(
        n_mega_blocks=1, encoder_hidden_size=64, encoder_output_size=96,
        embedding_size=16, mega_block_kernel_size=3, attention_hidden_size=8,
        dropout=0.0,
    )
    cfg = FrontendConfig.from_ms()
    mel0, _ = log_mel_spectrogram(jnp.zeros((1, 16000)), cfg)
    variables = jax.jit(model.init)(jax.random.key(0), mel0)
    kw = dict(frontend=cfg, buckets=[16000, 24000], batch_size=4)
    emb_f32 = SpeakerEmbedder(
        model, variables["params"], variables["batch_stats"], **kw)
    emb_q = SpeakerEmbedder(
        model, variables["params"], variables["batch_stats"], quantized=True, **kw)
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (12000, 22000, 16000)]
    a = emb_f32.embed(wavs)
    b = emb_q.embed(wavs)
    assert b.shape == a.shape
    cos = np.sum(a * b, axis=-1)
    assert (cos > 0.99).all(), cos
