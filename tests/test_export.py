"""AOT export round-trip: serialize -> deserialize -> same outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.models import TitaNet
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.utils.export import export_titanet_embedder, load_embedder


def test_export_roundtrip(tmp_path):
    cfg = FrontendConfig.from_ms()
    model = TitaNet(n_mega_blocks=1, encoder_hidden_size=32, encoder_output_size=48,
                    embedding_size=16, attention_hidden_size=8, dropout=0.0)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)) * 0.1, jnp.float32
    )
    lengths = jnp.asarray([16000, 12000])
    from titanet_tpu.ops.frontend import log_mel_spectrogram

    mel, _ = log_mel_spectrogram(wav, cfg)
    variables = jax.jit(model.init)(jax.random.key(0), mel)

    path = str(tmp_path / "embedder.stablehlo")
    export_titanet_embedder(
        model, variables, cfg, batch_size=2, num_samples=16000, path=path
    )
    served = load_embedder(path)
    out = np.asarray(served(wav, lengths))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    # reference output from the live model
    from titanet_tpu.models import l2_normalize

    mel2, _ = log_mel_spectrogram(wav, cfg, lengths=lengths)
    live = np.asarray(l2_normalize(model.apply(variables, mel2, train=False)))
    np.testing.assert_allclose(out, live, rtol=1e-5, atol=1e-6)
