"""End-to-end training smoke tests on the synthetic corpus (the role the
reference's DumbConvNet + tiny-split combo played, src/train.py:59-60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.data import ChunkConfig, DataLoader, SyntheticSpeakerDataset
from titanet_tpu.losses.heads import build_head
from titanet_tpu.models import DumbConvNet, TitaNet
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.train import (
    all_pairs_scores_labels,
    create_train_state,
    embed_step,
    eval_step,
    get_test_metrics,
    get_train_val_metrics,
    make_optimizer,
    train_step,
)

FRONTEND = FrontendConfig.from_ms()


def _loader(n_speakers=4, ups=6, batch_size=8, seed=0):
    ds = SyntheticSpeakerDataset(
        n_speakers=n_speakers, utterances_per_speaker=ups,
        min_seconds=1.0, max_seconds=1.4, seed=seed,
    )
    return ds, DataLoader(
        ds, batch_size=batch_size, chunk=ChunkConfig(max_length=1.5, enabled=True),
        seed=seed, prefetch=0,
    )


@pytest.mark.parametrize("loss_name", ["ce", "arc", "ge2e"])
def test_training_reduces_loss(loss_name):
    n_speakers = 4
    ds, loader = _loader(n_speakers=n_speakers)
    model = DumbConvNet(hidden_size=32, embedding_size=16, n_layers=2)
    head = build_head(loss_name, 16, n_speakers)
    opt = make_optimizer(start_lr=3e-3)
    mel0 = jnp.zeros((2, 101, 80))
    state = create_train_state(jax.random.key(0), model, head, opt, mel0, n_speakers)

    kwargs = dict(model=model, head=head, optimizer=opt, frontend=FRONTEND,
                  renorm_head=loss_name in ("arc", "cos", "sphere"))
    losses = []
    for epoch in range(6):
        loader.set_epoch(epoch)
        epoch_losses = []
        for batch in loader:
            state, metrics = train_step(
                state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
                jnp.asarray(batch.speaker_ids), **kwargs,
            )
            epoch_losses.append(float(metrics["loss"]))
        losses.append(np.mean(epoch_losses))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses


def test_eval_and_verification_pipeline():
    n_speakers = 4
    ds, loader = _loader(n_speakers=n_speakers)
    model = DumbConvNet(hidden_size=32, embedding_size=16, n_layers=1)
    head = build_head("ce", 16, n_speakers)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), n_speakers
    )
    batch = next(iter(loader))
    out = eval_step(
        state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
        jnp.asarray(batch.speaker_ids), model=model, head=head, frontend=FRONTEND,
    )
    assert np.isfinite(float(out["loss"]))
    m = get_train_val_metrics(batch.speaker_ids, np.asarray(out["preds"]), "val")
    assert 0 <= m["val/accuracy"] <= 1

    # batched verification: embed once, one matmul for all pairs
    emb = embed_step(
        state.params["backbone"], state.batch_stats,
        jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
        model=model, frontend=FRONTEND,
    )
    scores, labels = all_pairs_scores_labels(np.asarray(emb), batch.speaker_ids)
    tm = get_test_metrics(scores, labels, prefix="test")
    assert 0 <= tm["test/eer"] <= 1


def test_titanet_train_step_runs():
    """One real TitaNet-S-shaped (tiny) train step incl. specaugment."""
    model = TitaNet(n_mega_blocks=1, encoder_hidden_size=32, encoder_output_size=48,
                    embedding_size=16, attention_hidden_size=8, dropout=0.1)
    head = build_head("ce", 16, 4)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16000)) * 0.1,
                      jnp.float32)
    lengths = jnp.asarray([16000, 12000, 16000, 8000])
    speakers = jnp.asarray([0, 1, 2, 3])
    stats_before = [np.asarray(l).copy() for l in jax.tree.leaves(state.batch_stats)]
    state2, metrics = train_step(
        state, wav, lengths, speakers, model=model, head=head, optimizer=opt,
        frontend=FRONTEND, augment=(0.35, 1, 0.15, 1, 0.5),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # batch_stats changed (BN in train mode); old state was donated
    after = jax.tree.leaves(state2.batch_stats)
    changed = any(
        not np.allclose(b, np.asarray(a)) for b, a in zip(stats_before, after)
    )
    assert changed


def test_uniform_fast_path_matches_lengths_path():
    """`lengths=None` (packed-bucket fast path, used by the training loop
    for fully-packed batches) must produce the SAME loss and parameters as
    passing explicit full lengths — it drops the reflect fixup/masking ops,
    not semantics."""
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ce", 8, 4)
    opt = make_optimizer(start_lr=1e-3)

    def one(lengths):
        state = create_train_state(
            jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
        )
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 16000)) * 0.1, jnp.float32
        )
        return train_step(
            state, wav, lengths, jnp.asarray([0, 1, 2, 3]),
            model=model, head=head, optimizer=opt, frontend=FRONTEND,
        )

    s_fast, m_fast = one(None)
    s_len, m_len = one(jnp.full((4,), 16000))
    np.testing.assert_allclose(
        float(m_fast["loss"]), float(m_len["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s_fast.params), jax.tree.leaves(s_len.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_weight_ema_tracks_params(tmp_path):
    """Weight EMA (training.ema_decay): e_t = d*e_{t-1} + (1-d)*p_t after
    every update, eval swaps EMA weights in, and the EMA tree survives a
    checkpoint round trip. (New capability vs the reference — SURVEY.md
    §2.4 'no EMA'.)"""
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state

    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ce", 8, 4)
    opt = make_optimizer(start_lr=1e-2)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4, ema=True
    )
    p0 = jax.tree.map(np.asarray, state.params)
    np.testing.assert_allclose(
        jax.tree.leaves(state.ema_params)[0], jax.tree.leaves(p0)[0]
    )
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16000)) * 0.1, jnp.float32
    )
    lengths = jnp.full((4,), 16000)
    speakers = jnp.asarray([0, 1, 2, 3])
    d = 0.5
    expect = p0
    for _ in range(2):
        state, _ = train_step(
            state, wav, lengths, speakers, model=model, head=head,
            optimizer=opt, frontend=FRONTEND, ema_decay=d,
        )
        p = jax.tree.map(np.asarray, state.params)
        expect = jax.tree.map(lambda e, q: d * e + (1 - d) * q, expect, p)
    for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-7)
    # EMA differs from raw params and eval swaps it in
    assert not np.allclose(
        jax.tree.leaves(state.ema_params)[0], jax.tree.leaves(state.params)[0]
    )
    ev = ema_eval_state(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ev.params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]),
    )
    # checkpoint round trip preserves the EMA tree
    ckpt.save_checkpoint(str(tmp_path / "run"), 1, state)
    restored, ep = ckpt.restore_latest(str(tmp_path / "run"), state)
    assert ep == 1
    for a, b in zip(
        jax.tree.leaves(restored.ema_params), jax.tree.leaves(state.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("policy", [None, "dots_saveable"])
def test_remat_matches_plain_forward_and_grads(policy):
    """`TitaNet(remat=True)` (either checkpoint policy) must be a pure
    scheduling choice: identical loss and gradients to the plain model.
    (Measured slower on TPU v5e at B=128 — BENCHMARKS.md negative results —
    but kept as a memory lever; this guards its semantics.)"""
    import dataclasses

    base = TitaNet(n_mega_blocks=2, encoder_hidden_size=32, encoder_output_size=48,
                   embedding_size=16, attention_hidden_size=8, dropout=0.3)
    rem = dataclasses.replace(base, remat=True, remat_policy=policy)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, 101, 80)), jnp.float32
    )
    variables = base.init(jax.random.key(0), mel, train=False)

    def loss_of(model):
        def f(params):
            emb, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                mel, train=True, mutable=["batch_stats", "batch_moments"],
                rngs={"dropout": jax.random.key(7)},
            )
            return jnp.sum(emb**2)
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = jax.jit(lambda: loss_of(base))()
    l1, g1 = jax.jit(lambda: loss_of(rem))()
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_optimizer_schedule_matches_reference_cosine():
    """Reference uses CosineAnnealingLR stepped per epoch
    (src/train.py:137-144): lr(e) = eta_min + (lr0-eta_min)*(1+cos(pi*e/T))/2.
    Ours translates to per-step; check the per-epoch boundaries line up."""
    import optax

    start, end, epochs, spe = 1e-3, 1e-5, 10, 7
    opt = make_optimizer(start_lr=start, scheduler=True, end_lr=end,
                         total_epochs=epochs, steps_per_epoch=spe)
    # recover the schedule by applying the chain to a unit gradient
    params = {"w": jnp.zeros(1)}
    state = opt.init(params)
    lrs = []
    for step in range(epochs * spe):
        updates, state = opt.update({"w": jnp.ones(1)}, state, params)
        lrs.append(float(-updates["w"][0]))  # adam of constant grad -> ~lr
    # optax cosine_decay: value(k) = end + (start-end) * 0.5*(1+cos(pi*k/K))
    for epoch in (0, 5, 9):
        k = epoch * spe
        expected = end + (start - end) * 0.5 * (1 + np.cos(np.pi * k / (epochs * spe)))
        # adam's unit-gradient step magnitude ~= lr (bias-corrected, eps small)
        assert abs(lrs[k] - expected) / expected < 0.05, (epoch, lrs[k], expected)


def test_optimizer_warmup_and_clip():
    opt = make_optimizer(start_lr=1e-2, warmup_epochs=2, steps_per_epoch=5,
                         grad_clip_norm=1.0)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    big = {"w": jnp.full(3, 100.0)}  # norm >> 1 -> clipped to unit norm
    mags = []
    for _ in range(12):
        updates, state = opt.update(big, state, params)
        mags.append(float(jnp.linalg.norm(updates["w"])))
    # warmup: first step tiny, grows until step 10
    assert mags[0] < mags[5] < mags[9] * 1.01
    assert np.isfinite(mags).all()


def test_optimizer_gradient_accumulation():
    """accumulate_steps=k: params frozen for k-1 micro-steps, then one
    update equal to SGD on the MEAN of the k micro-grads."""
    opt = make_optimizer(name="sgd", start_lr=1.0, accumulate_steps=2)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0])}
    u1, state = opt.update(g1, state, params)
    assert float(jnp.abs(u1["w"]).max()) == 0.0  # no update yet
    u2, state = opt.update(g2, state, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), [-2.0, -2.0, -2.0])

    # full train_step integration: params move only on the k-th step
    n_speakers = 4
    _, loader = _loader(n_speakers=n_speakers)
    model = DumbConvNet(hidden_size=32, embedding_size=16, n_layers=1)
    head = build_head("ce", 16, n_speakers)
    acc_opt = make_optimizer(start_lr=3e-3, accumulate_steps=2)
    state = create_train_state(
        jax.random.key(0), model, head, acc_opt, jnp.zeros((2, 101, 80)),
        n_speakers,
    )
    kwargs = dict(model=model, head=head, optimizer=acc_opt, frontend=FRONTEND)
    it = iter(loader)
    batch = next(it)
    p0 = jax.tree.map(jnp.array, state.params)
    state, _ = train_step(
        state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
        jnp.asarray(batch.speaker_ids), **kwargs,
    )
    same = jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, state.params))
    assert same, "params must not move on the first micro-step"
    batch = next(it)
    state, _ = train_step(
        state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
        jnp.asarray(batch.speaker_ids), **kwargs,
    )
    same = jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, state.params))
    assert not same, "params must update on the accumulation boundary"


def test_train_xla_options(monkeypatch):
    """Backend-conditional compiler options: env override wins; the TPU
    default never leaks onto other backends (tests run on CPU)."""
    from titanet_tpu.train.state import train_xla_options

    monkeypatch.setenv("TITANET_TRAIN_XLA_OPTIONS",
                       '{"xla_tpu_async_copy_bandwidth_scaling_factor": "1.0"}')
    assert train_xla_options() == {
        "xla_tpu_async_copy_bandwidth_scaling_factor": "1.0"
    }
    monkeypatch.setenv("TITANET_TRAIN_XLA_OPTIONS", "{}")
    assert train_xla_options() == {}
    monkeypatch.delenv("TITANET_TRAIN_XLA_OPTIONS")
    assert (train_xla_options() == {}) == (jax.default_backend() != "tpu")


def test_infer_xla_options(monkeypatch):
    """Serving twin of the above: env override wins; TPU default never
    leaks onto other backends (tests run on CPU)."""
    from titanet_tpu.train.state import infer_xla_options

    monkeypatch.setenv("TITANET_INFER_XLA_OPTIONS",
                       '{"xla_tpu_async_copy_bandwidth_scaling_factor": "4.0"}')
    assert infer_xla_options() == {
        "xla_tpu_async_copy_bandwidth_scaling_factor": "4.0"
    }
    monkeypatch.setenv("TITANET_INFER_XLA_OPTIONS", "{}")
    assert infer_xla_options() == {}
    monkeypatch.delenv("TITANET_INFER_XLA_OPTIONS")
    assert (infer_xla_options() == {}) == (jax.default_backend() != "tpu")
