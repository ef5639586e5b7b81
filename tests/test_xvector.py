"""x-vector model family (titanet_tpu/models/xvector.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.models import get_xvector, l2_normalize


def test_param_count_paper_scale():
    m = get_xvector(embedding_size=512)
    v = m.init(jax.random.key(0), jnp.zeros((2, 101, 80)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert abs(n / 1e6 - 4.4) < 0.3, n  # Snyder 2018 TDNN scale


def test_masked_padded_equals_solo():
    model = get_xvector(hidden_size=64, frame_out=128)
    v = model.init(jax.random.key(0), jnp.zeros((2, 100, 80)))
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 60, 80)).astype(np.float32)
    b = rng.standard_normal((1, 100, 80)).astype(np.float32)
    solo = model.apply(v, jnp.asarray(a))
    batch = np.zeros((2, 100, 80), np.float32)
    batch[0, :60] = a[0]
    batch[1] = b[0]
    mask = np.zeros((2, 100), np.float32)
    mask[0, :60] = 1
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

    model = get_xvector(hidden_size=64, frame_out=128)
    head = build_head("arc", 192, 4, scale=30.0, margin=0.2)
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
        optimizer=opt, frontend=frontend, renorm_head=True,
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


def test_cli_builds_xvector():
    from titanet_tpu.cli import build_model
    from titanet_tpu.config import Config

    cfg = Config.from_dict({"xvector": {"enabled": True, "hidden_size": 128}})
    model = build_model(cfg)
    assert model.__class__.__name__ == "XVector" and model.hidden_size == 128
