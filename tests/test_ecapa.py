"""ECAPA-TDNN model family (titanet_tpu/models/ecapa.py): architecture
invariants, the masked solo-vs-padded embedding property the verification
protocol depends on, and train/embed-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.models import get_ecapa, l2_normalize
from titanet_tpu.models.ecapa import Res2DilatedConv


def _init(model, t=101, n_mels=80):
    return model.init(jax.random.key(0), jnp.zeros((2, t, n_mels)))


def test_param_counts_match_paper_scales():
    """arXiv:2005.07143 Table 1: C=512 -> 6.2M, C=1024 -> 14.7M."""
    for channels, target_m in ((512, 6.2), (1024, 14.7)):
        v = _init(get_ecapa(channels=channels))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert abs(n / 1e6 - target_m) < 0.15, (channels, n)


def test_forward_shape_and_norm():
    model = get_ecapa()
    v = _init(model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 150, 80)), jnp.float32)
    emb = model.apply(v, x)
    assert emb.shape == (3, 192)
    unit = l2_normalize(emb)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(unit), axis=1), 1.0, rtol=1e-5)


def test_res2_hierarchical_receptive_field():
    """Group i's output must depend on group j<=i inputs only (y_1 identity,
    y_i = K_i(x_i + y_{i-1}))."""
    conv = Res2DilatedConv(kernel_size=3, dilation=1, scale=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 20, 32)), jnp.float32)
    v = conv.init(jax.random.key(0), x)
    base = conv.apply(v, x)
    # perturb the LAST group's input: groups 0..2 outputs must not change
    x2 = x.at[..., 24:].add(1.0)
    out = conv.apply(v, x2)
    np.testing.assert_array_equal(np.asarray(base)[..., :24], np.asarray(out)[..., :24])
    assert not np.allclose(np.asarray(base)[..., 24:], np.asarray(out)[..., 24:])
    # identity branch: group 0 output == group 0 input
    np.testing.assert_array_equal(np.asarray(base)[..., :8], np.asarray(x)[..., :8])


def test_masked_padded_equals_solo():
    """The verification protocol (run_verification masked=True) requires a
    padded batched embedding to equal the utterance's solo embedding."""
    model = get_ecapa(channels=128)
    v = _init(model)
    rng = np.random.default_rng(2)
    t_short, t_long = 60, 100
    a = rng.standard_normal((1, t_short, 80)).astype(np.float32)
    b = rng.standard_normal((1, t_long, 80)).astype(np.float32)
    solo_a = model.apply(v, jnp.asarray(a))
    # batch with a zero-padded to t_long + mask
    batch = np.zeros((2, t_long, 80), np.float32)
    batch[0, :t_short] = a[0]
    batch[1] = b[0]
    mask = np.zeros((2, t_long), np.float32)
    mask[0, :t_short] = 1
    mask[1] = 1
    emb = model.apply(v, jnp.asarray(batch), mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(emb[0]), np.asarray(solo_a[0]), rtol=2e-4, atol=2e-5
    )


def test_train_and_embed_step_integration():
    """ECAPA drives the shared train/embed steps unchanged (fused frontend,
    deferred BN moments, Adam) with finite loss and updated stats."""
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import embed_step, train_step

    model = get_ecapa(channels=128)
    head = build_head("ce", 192, 4)
    opt = make_optimizer(start_lr=1e-3)
    frontend = FrontendConfig.from_ms()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    before = jax.tree.map(jnp.array, state.batch_stats)
    wav = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 16000)), jnp.float32
    ) * 0.1
    spk = jnp.arange(4)
    state2, metrics = train_step(
        state, wav, None, spk, model=model, head=head, optimizer=opt,
        frontend=frontend,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    changed = jax.tree.map(
        lambda x, y: not np.allclose(np.asarray(x), np.asarray(y)),
        before, state2.batch_stats,
    )
    assert any(jax.tree.leaves(changed))
    emb = embed_step(
        state2.params["backbone"], state2.batch_stats, wav,
        jnp.full((4,), 16000, jnp.int32), model=model, frontend=frontend,
        masked=True,
    )
    assert emb.shape == (4, 192)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_cli_builds_ecapa():
    from titanet_tpu.cli import build_model
    from titanet_tpu.config import Config

    cfg = Config.from_dict({"ecapa": {"enabled": True, "channels": 256}})
    model = build_model(cfg)
    assert model.__class__.__name__ == "EcapaTdnn" and model.channels == 256


@pytest.mark.parametrize("n_devices", [2])
def test_ecapa_shards_under_gspmd(n_devices):
    """Batch-sharded embed over the virtual mesh equals single-device."""
    from titanet_tpu.parallel import batch_sharding, make_mesh

    if len(jax.devices()) < n_devices:
        pytest.skip("needs multi-device mesh")
    model = get_ecapa(channels=128)
    v = _init(model)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((4, 101, 80)), jnp.float32)
    single = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    mesh = make_mesh(n_devices)
    sh = batch_sharding(mesh, "data")
    xs = jax.device_put(x, sh)
    sharded = jax.jit(lambda v, x: model.apply(v, x))(v, xs)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=1e-5)
