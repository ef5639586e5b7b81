"""Margin warmup: AngularMarginHead.margin_scale + train_step scheduling."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.losses.heads import AngularMarginHead, make_arcface


def _data(n=8, e=192, k=5, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, k, n), jnp.int32)
    return emb, tgt


def test_scale_zero_equals_no_margin():
    emb, tgt = _data()
    arc = make_arcface(5, margin=0.5, scale=30.0)
    plain = AngularMarginHead(n_classes=5, m1=1.0, m2=0.0, m3=0.0, scale=30.0)
    v = arc.init(jax.random.key(0), emb, tgt)
    _, _, loss_scaled = arc.apply(v, emb, tgt, margin_scale=jnp.float32(0.0))
    _, _, loss_plain = plain.apply(v, emb, tgt)
    np.testing.assert_allclose(float(loss_scaled), float(loss_plain), rtol=1e-6)


def test_scale_one_equals_default():
    emb, tgt = _data(seed=1)
    arc = make_arcface(5, margin=0.5, scale=30.0)
    v = arc.init(jax.random.key(0), emb, tgt)
    _, _, loss_scaled = arc.apply(v, emb, tgt, margin_scale=jnp.float32(1.0))
    _, _, loss_default = arc.apply(v, emb, tgt)
    np.testing.assert_allclose(float(loss_scaled), float(loss_default), rtol=1e-6)


def test_scale_monotone_in_margin():
    # a larger margin scale makes the target logit strictly harder
    emb, tgt = _data(seed=2)
    arc = make_arcface(5, margin=0.5, scale=30.0)
    v = arc.init(jax.random.key(0), emb, tgt)
    losses = [
        float(arc.apply(v, emb, tgt, margin_scale=jnp.float32(s))[2])
        for s in (0.0, 0.5, 1.0)
    ]
    assert losses[0] < losses[1] < losses[2], losses


def test_train_step_warmup_first_step_is_marginless():
    from titanet_tpu.models import get_xvector
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import train_step

    model = get_xvector(hidden_size=32, frame_out=64)
    frontend = FrontendConfig.from_ms()
    opt = make_optimizer(start_lr=1e-3)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((4, 16000)) * 0.1, jnp.float32)
    spk = jnp.arange(4, dtype=jnp.int32)

    def first_loss(head, **kw):
        state = create_train_state(
            jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
        )
        _, m = train_step(
            state, wav, None, spk, model=model, head=head, optimizer=opt,
            frontend=frontend, renorm_head=True, **kw,
        )
        return float(m["loss"])

    # at state.step == 0 the warmup scale is 0: the arc head must match a
    # margin-free angular head exactly (same init params by construction)
    warm = first_loss(make_arcface(4, margin=0.5, scale=30.0),
                      margin_warmup_steps=100)
    plain = first_loss(
        AngularMarginHead(n_classes=4, m1=1.0, m2=0.0, m3=0.0, scale=30.0)
    )
    full = first_loss(make_arcface(4, margin=0.5, scale=30.0))
    np.testing.assert_allclose(warm, plain, rtol=1e-6)
    assert warm < full  # the un-warmed margin is strictly harder


def test_cli_margin_warmup_steps():
    from titanet_tpu.cli import _margin_warmup_steps
    from titanet_tpu.config import Config

    cfg = Config.from_dict({
        "training": {"loss": "arc"},
        "loss": {"arc": {"margin_warmup_epochs": 5}},
    })
    assert _margin_warmup_steps(cfg, steps_per_epoch=7) == 35
    cfg2 = Config.from_dict({"training": {"loss": "arc"}})
    assert _margin_warmup_steps(cfg2, steps_per_epoch=7) is None
    cfg3 = Config.from_dict({
        "training": {"loss": "ce"},
        "loss": {"arc": {"margin_warmup_epochs": 5}},
    })
    assert _margin_warmup_steps(cfg3, steps_per_epoch=7) is None


def test_sub_centers_one_is_bit_identical():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from titanet_tpu.losses.heads import build_head

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((8, 192)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)
    plain = build_head("arc", 192, 5)
    k1 = build_head("arc", 192, 5, sub_centers=1)
    vp = plain.init(jax.random.key(0), emb, tgt)
    v1 = k1.init(jax.random.key(0), emb, tgt)
    np.testing.assert_array_equal(
        np.asarray(vp["params"]["weight"]), np.asarray(v1["params"]["weight"])
    )
    _, _, lp = plain.apply(vp, emb, tgt)
    _, _, l1 = k1.apply(v1, emb, tgt)
    assert float(lp) == float(l1)


def test_sub_centers_max_selects_best_prototype():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from titanet_tpu.losses.heads import build_head, head_param_count

    n_classes, k, e = 3, 2, 8
    head = build_head("cos", e, n_classes, sub_centers=k)
    emb = jnp.eye(e)[:1]  # unit vector along dim 0
    tgt = jnp.zeros((1,), jnp.int32)
    v = head.init(jax.random.key(0), emb, tgt)
    assert v["params"]["weight"].shape == (e, n_classes * k)
    assert head_param_count("cos", e, n_classes, sub_centers=k) == e * n_classes * k
    # class 0: sub-center 0 orthogonal, sub-center 1 aligned -> max picks 1
    w = np.zeros((e, n_classes * k), np.float32)
    w[1, 0] = 1.0  # class 0 / sub 0: orthogonal to emb
    w[0, 1] = 1.0  # class 0 / sub 1: aligned
    w[2, 2:] = 1.0  # other classes: orthogonal
    norm_emb, preds, loss = head.apply({"params": {"weight": jnp.asarray(w)}}, emb, tgt)
    assert int(preds[0]) == 0  # aligned sub-center won the class cosine
    assert np.isfinite(float(loss))


def test_sub_centers_trains_end_to_end():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_xvector
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import train_step

    model = get_xvector(hidden_size=32, frame_out=64)
    head = build_head("arc", 192, 4, sub_centers=3)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    wav = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 16000)) * 0.1, jnp.float32
    )
    state, metrics = train_step(
        state, wav, None, jnp.arange(4), model=model, head=head,
        optimizer=opt, frontend=FrontendConfig.from_ms(), renorm_head=True,
    )
    assert np.isfinite(float(metrics["loss"]))


def test_margin_zero_is_normalized_softmax():
    # make_arcface(margin=0) is the legitimate degenerate NormFace config
    # (used by the docs/eer_bench margin-decomposition probe): the loss
    # must equal plain softmax CE over s * cos(theta) logits.
    emb, tgt = _data(seed=3)
    head = make_arcface(5, margin=0.0, scale=30.0)
    v = head.init(jax.random.key(1), emb, tgt)
    norm_emb, _, loss = head.apply(v, emb, tgt)

    w = v["params"]["weight"]
    w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
    logits = 30.0 * (norm_emb @ w)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    expected = -jnp.mean(log_p[jnp.arange(len(tgt)), tgt])
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)
