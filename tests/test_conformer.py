"""MFA-Conformer model family (titanet_tpu/models/conformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.models import get_conformer
from titanet_tpu.models.conformer import rel_pos_embedding, rel_shift


def _small(**kw):
    kw.setdefault("num_blocks", 2)
    kw.setdefault("dim", 64)
    kw.setdefault("ff_hidden", 128)
    kw.setdefault("num_heads", 4)
    return get_conformer(**kw)


def test_rel_shift_matches_gather():
    """out[i, j] must pick the relative distance i-j: x[i, (T-1)-i+j]."""
    t = 7
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, t, 2 * t - 1)),
        jnp.float32,
    )
    out = np.asarray(rel_shift(x))
    xn = np.asarray(x)
    for i in range(t):
        for j in range(t):
            np.testing.assert_array_equal(
                out[..., i, j], xn[..., i, (t - 1) - i + j]
            )


def test_rel_pos_embedding_encodes_distance():
    emb = np.asarray(rel_pos_embedding(5, 16))
    assert emb.shape == (9, 16)
    # distance 0 sits at row T-1: sin components all zero, cos all one
    np.testing.assert_allclose(emb[4, :8], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[4, 8:], 1.0, atol=1e-7)
    # symmetric distances differ only in sin sign
    np.testing.assert_allclose(emb[3, :8], -emb[5, :8], atol=1e-6)
    np.testing.assert_allclose(emb[3, 8:], emb[5, 8:], atol=1e-6)


def test_param_count_paper_scale():
    m = get_conformer()
    v = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 101, 80))))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert abs(n / 1e6 - 20.5) < 1.0, n  # arXiv:2203.15249 "Conformer (small)"


def test_masked_padded_equals_solo():
    """Padded batched embedding == solo embedding, both length parities
    (fixed subsampling padding; attention keys masked; masked BN stats)."""
    model = _small()
    v = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 100, 80)))
    rng = np.random.default_rng(1)
    for ln in (60, 61):  # even and odd solo lengths in an even batch T
        a = rng.standard_normal((1, ln, 80)).astype(np.float32)
        b = rng.standard_normal((1, 100, 80)).astype(np.float32)
        solo = model.apply(v, jnp.asarray(a))
        batch = np.zeros((2, 100, 80), np.float32)
        batch[0, :ln] = a[0]
        batch[1] = b[0]
        mask = np.zeros((2, 100), np.float32)
        mask[0, :ln] = 1
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

    model = _small()
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


def test_dropout_rng_changes_training_forward():
    """The blocks' dropout is live in train mode (rng-dependent)."""
    model = _small()
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 101, 80)), jnp.float32
    )
    v = jax.jit(model.init)(jax.random.key(0), x)

    def fwd(key):
        out, _ = model.apply(
            v, x, train=True, mutable=["batch_stats", "batch_moments"],
            rngs={"dropout": key},
        )
        return out

    a = fwd(jax.random.key(1))
    b = fwd(jax.random.key(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_cli_builds_conformer():
    from titanet_tpu.cli import build_model
    from titanet_tpu.config import Config

    cfg = Config.from_dict({"conformer": {"enabled": True, "dim": 128}})
    model = build_model(cfg)
    assert model.__class__.__name__ == "MfaConformer" and model.dim == 128
