"""ResNet r-vector model family (titanet_tpu/models/resnet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.models import get_resnet, l2_normalize


def test_param_count_rvector_scale():
    m = get_resnet(depth=34, base_channels=32)
    v = m.init(jax.random.key(0), jnp.zeros((2, 33, 80)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert abs(n / 1e6 - 6.3) < 0.5, n  # r-vector ResNet34 scale


def test_depth18_smaller():
    m34 = get_resnet(depth=34, base_channels=16)
    m18 = get_resnet(depth=18, base_channels=16)
    n = lambda m: sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(m.init(jax.random.key(0), jnp.zeros((1, 17, 80)))["params"])
    )
    assert n(m18) < n(m34)


def test_unknown_depth_raises():
    m = get_resnet(depth=50)
    with pytest.raises(ValueError, match="depth"):
        m.init(jax.random.key(0), jnp.zeros((1, 17, 80)))


@pytest.mark.parametrize("solo_len", [60, 61])  # even AND odd valid length:
# fixed (torch-style) conv padding keeps stride-2 receptive fields aligned
# between the solo forward and the padded batch regardless of length parity
def test_masked_padded_equals_solo(solo_len):
    model = get_resnet(depth=18, base_channels=8)
    v = model.init(jax.random.key(0), jnp.zeros((2, 100, 80)))
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, solo_len, 80)).astype(np.float32)
    b = rng.standard_normal((1, 100, 80)).astype(np.float32)
    solo = model.apply(v, jnp.asarray(a))
    batch = np.zeros((2, 100, 80), np.float32)
    batch[0, :solo_len] = a[0]
    batch[1] = b[0]
    mask = np.zeros((2, 100), np.float32)
    mask[0, :solo_len] = 1
    mask[1] = 1
    emb = model.apply(v, jnp.asarray(batch), mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(emb[0]), np.asarray(solo[0]), rtol=2e-4, atol=2e-5
    )


def test_train_and_embed_step_integration():
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import embed_step, train_step

    model = get_resnet(depth=18, base_channels=8)
    head = build_head("ce", 192, 4)
    opt = make_optimizer(start_lr=1e-3)
    frontend = FrontendConfig.from_ms()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 16000)), jnp.float32
    ) * 0.1
    state2, metrics = train_step(
        state, wav, None, jnp.arange(4), model=model, head=head,
        optimizer=opt, frontend=frontend,
    )
    assert np.isfinite(float(metrics["loss"])) and int(state2.step) == 1
    emb = embed_step(
        state2.params["backbone"], state2.batch_stats, wav,
        jnp.full((4,), 16000, jnp.int32), model=model, frontend=frontend,
        masked=True,
    )
    assert emb.shape == (4, 192)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5
    )


def test_masked_train_statistics_ignore_padding():
    # with masked BN, a padded batch's TRAIN forward on the valid rows must
    # match the same rows run unpadded (same batch stats come out)
    model = get_resnet(depth=18, base_channels=8)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 80)).astype(np.float32)
    v = model.init(jax.random.key(0), jnp.zeros((2, 64, 80)))
    full_mask = np.ones((2, 64), np.float32)
    out_ref, vars_ref = model.apply(
        v, jnp.asarray(x), train=True, mask=jnp.asarray(full_mask),
        mutable=["batch_stats"],
    )
    xp = np.zeros((2, 96, 80), np.float32)
    xp[:, :64] = x
    mask = np.zeros((2, 96), np.float32)
    mask[:, :64] = 1
    out_pad, vars_pad = model.apply(
        v, jnp.asarray(xp), train=True, mask=jnp.asarray(mask),
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_ref), rtol=5e-4, atol=5e-5
    )
    ref_leaves = jax.tree.leaves(vars_ref["batch_stats"])
    pad_leaves = jax.tree.leaves(vars_pad["batch_stats"])
    for r, p in zip(ref_leaves, pad_leaves):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), rtol=5e-4, atol=5e-5)


def test_cli_builds_resnet():
    from titanet_tpu.cli import build_model
    from titanet_tpu.config import Config

    cfg = Config.from_dict({"resnet": {"enabled": True, "depth": 18}})
    model = build_model(cfg)
    assert model.__class__.__name__ == "SpeakerResNet" and model.depth == 18
