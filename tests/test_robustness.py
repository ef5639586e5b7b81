"""Robustness/sanitizer-style tests (SURVEY.md §5: the JAX analogues of the
reference's determinism/failure-handling story)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.data import ChunkConfig, DataLoader, SyntheticSpeakerDataset
from titanet_tpu.losses.heads import build_head
from titanet_tpu.models import DumbConvNet
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.train import create_train_state, make_optimizer, train_step
from titanet_tpu.train.loop import NonFiniteLossError, train_one_epoch

FRONTEND = FrontendConfig.from_ms()


def _setup(lr=1e-3):
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ce", 8, 4)
    opt = make_optimizer(start_lr=lr)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    return model, head, opt, state


def test_donation_does_not_corrupt_results():
    """Donation/aliasing sanity: two identical step sequences produce
    identical losses (the donated buffers are never read after reuse)."""
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((4, 16000)) * 0.1, jnp.float32)
    lengths = jnp.full((4,), 16000, jnp.int32)
    speakers = jnp.asarray([0, 1, 2, 3])

    losses = []
    for _ in range(2):
        model, head, opt, state = _setup()
        seq = []
        for _ in range(4):
            state, m = train_step(
                state, wav, lengths, speakers,
                model=model, head=head, optimizer=opt, frontend=FRONTEND,
            )
            seq.append(float(m["loss"]))
        losses.append(seq)
    np.testing.assert_array_equal(losses[0], losses[1])
    # and the loss actually moves (the optimizer runs on real data)
    assert losses[0][0] != losses[0][-1]


def test_non_finite_loss_aborts_epoch():
    """Reference aborts on non-finite loss (src/learn.py:110-112); ours
    raises NonFiniteLossError from the loop."""
    ds = SyntheticSpeakerDataset(n_speakers=4, utterances_per_speaker=4,
                                 min_seconds=1.0, max_seconds=1.1)
    model, head, opt, state = _setup(lr=1e18)  # guaranteed blow-up
    loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=False), prefetch=0)
    with pytest.raises(NonFiniteLossError):
        for _ in range(8):  # a few epochs to let it diverge
            state, _, _ = train_one_epoch(
                1, 1, state, loader,
                model=model, head=head, optimizer=opt, frontend=FRONTEND,
            )


def test_degenerate_inputs_do_not_nan():
    """Silence and tiny batches must not produce NaNs anywhere."""
    model, head, opt, state = _setup()
    wav = jnp.zeros((2, 16000), jnp.float32)  # pure silence
    lengths = jnp.asarray([16000, 400])  # one nearly-empty utterance
    speakers = jnp.asarray([0, 1])
    state, m = train_step(
        state, wav, lengths, speakers,
        model=model, head=head, optimizer=opt, frontend=FRONTEND,
    )
    assert np.isfinite(float(m["loss"]))
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_compilation_cache_round_trip(tmp_path, monkeypatch):
    """enable_compilation_cache persists compiled executables to disk (new
    capability vs the reference: remote TPU compiles cost ~5-60 s, so
    restarted/resumed runs replay from the cache)."""
    from titanet_tpu.utils import enable_compilation_cache

    d = str(tmp_path / "xla_cache")
    enable_compilation_cache(d)
    try:
        jax.jit(lambda x: x * 3 + 1)(jnp.ones((8,))).block_until_ready()
        import os

        assert any("cache" in f for f in os.listdir(d))
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
