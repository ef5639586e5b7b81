"""Golden tests: our channels-last ops vs torch CPU semantics.

The reference delegates all NN math to torch (src/modules.py); torch (CPU)
is available here, so these tests check exact numerical parity of each
primitive against the torch op it rebuilds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from titanet_tpu.ops import (
    AttentiveStatsPooling,
    BatchNorm,
    DepthwiseSeparableConv1d,
    SamePadConv1d,
    SqueezeExcitation,
)


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("kernel_size,stride,dilation", [(3, 1, 1), (7, 1, 1), (1, 1, 1), (3, 2, 1), (5, 1, 2)])
def test_same_pad_conv_matches_torch(kernel_size, stride, dilation):
    B, T, CI, CO = 2, 37, 8, 16
    x = _rand(B, T, CI)
    w = _rand(CO, CI, kernel_size, seed=1)
    b = _rand(CO, seed=2)

    # torch: reference Conv1dSamePadding forward (src/modules.py:14-40)
    xt = torch.from_numpy(x).transpose(1, 2)
    pad = (
        stride * (T - 1) - T + kernel_size + (dilation - 1) * (kernel_size - 1)
    ) // 2
    ref = torch.nn.functional.conv1d(
        torch.nn.functional.pad(xt, (pad, pad)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        dilation=dilation,
    ).transpose(1, 2).numpy()

    mod = SamePadConv1d(features=CO, kernel_size=kernel_size, stride=stride, dilation=dilation)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    # install torch weights: torch [CO, CI, K] -> WIO [K, CI, CO]
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_depthwise_separable_matches_torch():
    B, T, CI, CO, K = 2, 50, 12, 24, 7
    x = _rand(B, T, CI)
    w_dw = _rand(CI, 1, K, seed=3)  # groups=CI
    b_dw = _rand(CI, seed=4)
    w_pw = _rand(CO, CI, 1, seed=5)
    b_pw = _rand(CO, seed=6)

    xt = torch.from_numpy(x).transpose(1, 2)
    pad = (K - 1) // 2
    mid = torch.nn.functional.conv1d(
        torch.nn.functional.pad(xt, (pad, pad)),
        torch.from_numpy(w_dw), torch.from_numpy(b_dw), groups=CI,
    )
    ref = torch.nn.functional.conv1d(
        mid, torch.from_numpy(w_pw), torch.from_numpy(b_pw)
    ).transpose(1, 2).numpy()

    mod = DepthwiseSeparableConv1d(features=CO, kernel_size=K)
    params = {
        "params": {
            "depthwise": {
                "kernel": jnp.asarray(w_dw.transpose(2, 1, 0)),
                "bias": jnp.asarray(b_dw),
            },
            "pointwise": {
                "kernel": jnp.asarray(w_pw.transpose(2, 1, 0)),
                "bias": jnp.asarray(b_pw),
            },
        }
    }
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_batchnorm_train_and_eval_match_torch():
    B, T, C = 4, 19, 6
    x = _rand(B, T, C)
    bn_t = torch.nn.BatchNorm1d(C)
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(_rand(C, seed=7)))
        bn_t.bias.copy_(torch.from_numpy(_rand(C, seed=8)))

    mod = BatchNorm()
    variables = {
        "params": {
            "scale": jnp.asarray(bn_t.weight.detach().numpy()),
            "bias": jnp.asarray(bn_t.bias.detach().numpy()),
        },
        "batch_stats": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
    }

    # two training steps to exercise running-stat updates
    for seed in (10, 11):
        xb = _rand(B, T, C, seed=seed)
        xt = torch.from_numpy(xb).transpose(1, 2)
        bn_t.train()
        ref = bn_t(xt).transpose(1, 2).detach().numpy()
        out, updates = mod.apply(
            variables, jnp.asarray(xb), use_running_average=False, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"], **updates}
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )

    # eval mode uses running stats
    bn_t.eval()
    xe = _rand(B, T, C, seed=12)
    ref = bn_t(torch.from_numpy(xe).transpose(1, 2)).transpose(1, 2).detach().numpy()
    out = mod.apply(variables, jnp.asarray(xe), use_running_average=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_2d_input():
    B, C = 8, 5
    x = _rand(B, C)
    bn_t = torch.nn.BatchNorm1d(C)
    bn_t.train()
    ref = bn_t(torch.from_numpy(x)).detach().numpy()
    mod = BatchNorm()
    variables = mod.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)
    out, _ = mod.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_squeeze_excitation_matches_torch():
    B, T, C, R = 3, 21, 32, 16
    x = _rand(B, T, C)
    w1 = _rand(C // R, C, seed=20)
    w2 = _rand(C, C // R, seed=21)

    xt = torch.from_numpy(x).transpose(1, 2)
    squeezed = xt.mean(dim=-1)
    e = torch.sigmoid(
        torch.nn.functional.linear(
            torch.relu(torch.nn.functional.linear(squeezed, torch.from_numpy(w1))),
            torch.from_numpy(w2),
        )
    )
    ref = (xt * e.unsqueeze(-1)).transpose(1, 2).numpy()

    mod = SqueezeExcitation(reduction=R)
    params = {
        "params": {
            "fc1": {"kernel": jnp.asarray(w1.T)},
            "fc2": {"kernel": jnp.asarray(w2.T)},
        }
    }
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_attentive_stats_pooling_matches_reference_math():
    B, T, C, H = 2, 15, 24, 8
    x = _rand(B, T, C)
    w_in = _rand(H, C, seed=30)
    b_in = _rand(H, seed=31)
    w_out = _rand(C, H, seed=32)
    b_out = _rand(C, seed=33)

    # reference math (src/models.py:553-584) in torch
    xt = torch.from_numpy(x).transpose(1, 2)  # [B, C, T]
    energies = torch.nn.functional.linear(
        torch.tanh(
            torch.nn.functional.linear(
                xt.transpose(1, 2), torch.from_numpy(w_in), torch.from_numpy(b_in)
            )
        ),
        torch.from_numpy(w_out),
        torch.from_numpy(b_out),
    ).transpose(1, 2)
    alphas = torch.softmax(energies, dim=2)
    means = torch.sum(alphas * xt, dim=2)
    residuals = torch.sum(alphas * xt**2, dim=2) - means**2
    stds = torch.sqrt(residuals.clamp(min=1e-6))
    ref = torch.cat([means, stds], dim=1).numpy()

    mod = AttentiveStatsPooling(hidden_size=H)
    params = {
        "params": {
            "in_linear": {"kernel": jnp.asarray(w_in.T), "bias": jnp.asarray(b_in)},
            "out_linear": {"kernel": jnp.asarray(w_out.T), "bias": jnp.asarray(b_out)},
        }
    }
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_masked_pooling_ignores_padding():
    B, T, C = 2, 10, 16
    x = jnp.asarray(_rand(B, T, C))
    mod = AttentiveStatsPooling(hidden_size=4)
    params = mod.init(jax.random.key(0), x)
    mask = jnp.ones((B, T)).at[:, 7:].set(0.0)
    out_masked = mod.apply(params, x, mask=mask)
    # garbage in padded frames must not change the masked output
    x_garbage = x.at[:, 7:, :].set(99.0)
    out_masked2 = mod.apply(params, x_garbage, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_masked2), rtol=1e-5, atol=1e-5
    )


def test_simple_pooling_masked():
    from titanet_tpu.ops import SimplePooling

    x = jnp.asarray(_rand(2, 10, 16))
    mod = SimplePooling()
    params = mod.init(jax.random.key(0), x)
    mask = jnp.ones((2, 10)).at[:, 6:].set(0.0)
    a = mod.apply(params, x, mask=mask)
    x_garbage = x.at[:, 6:, :].set(1e6)
    b = mod.apply(params, x_garbage, mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_fast_dropout_statistics():
    """ADVICE r2: keep fraction and 1/keep scaling, on both PRNG-width
    paths — rate=0.5 (uint8 bits) and rate=0.3 (uint32 fallback)."""
    from titanet_tpu.ops.norm import FastDropout

    x = jnp.ones((256, 256), jnp.float32)
    for rate, expect_scale in ((0.5, 2.0), (0.3, 1.0 / 0.7)):
        mod = FastDropout(rate=rate)
        out = mod.apply({}, x, rngs={"dropout": jax.random.key(7)})
        out = np.asarray(out)
        kept = out != 0.0
        # kept values are scaled by exactly 1/keep
        np.testing.assert_allclose(out[kept], expect_scale, rtol=1e-6)
        # keep fraction within 4 sigma of binomial expectation
        n = out.size
        keep = 1.0 - rate
        sigma = (keep * (1 - keep) / n) ** 0.5
        assert abs(kept.mean() - keep) < 4 * sigma


def test_fast_dropout_edge_rates():
    from titanet_tpu.ops.norm import FastDropout

    x = jnp.asarray(_rand(4, 8))
    # rate=0 and deterministic: identity
    out = FastDropout(rate=0.0).apply({}, x, rngs={"dropout": jax.random.key(0)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = FastDropout(rate=0.7, deterministic=True).apply({}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # rate=1.0: all zeros (nn.Dropout semantics), not a ZeroDivisionError
    out = FastDropout(rate=1.0).apply({}, x, rngs={"dropout": jax.random.key(0)})
    assert np.all(np.asarray(out) == 0.0)


def test_fused_frontend_fallback_warns_once():
    """ADVICE r2: use_pallas_fused=True falling back to XLA must emit a
    one-time warning naming the reason."""
    import warnings

    from titanet_tpu.ops import frontend as fe

    cfg = fe.FrontendConfig.from_ms(use_pallas_fused=True)
    wav = jnp.zeros((2, 4000), jnp.float32)
    mel_fb = jnp.asarray(
        fe.mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
    )
    fe._warned_fused_fallback.clear()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fe.log_mel_spectrogram(wav, cfg, mel_fb=mel_fb)  # forced XLA path
        fe.log_mel_spectrogram(wav, cfg, mel_fb=mel_fb)  # same reason: silent
    msgs = [str(w.message) for w in rec if "use_pallas_fused" in str(w.message)]
    assert len(msgs) == 1 and "mel_fb" in msgs[0]


def test_deferred_bn_ema_matches_inline():
    """BatchNorm deferred-EMA mode (mutable "batch_moments" +
    ema_update_batch_stats) must produce bit-equal running stats to the
    inline torch-semantics update."""
    from titanet_tpu.ops.norm import BatchNorm, ema_update_batch_stats

    x = jnp.asarray(_rand(4, 7, 6, seed=3))
    mod = BatchNorm()
    variables = mod.init(jax.random.key(0), x, use_running_average=False)
    stats0 = variables["batch_stats"]

    # inline: two successive updates
    _, upd1 = mod.apply(
        {"params": variables["params"], "batch_stats": stats0},
        x, use_running_average=False, mutable=["batch_stats"],
    )
    _, upd2 = mod.apply(
        {"params": variables["params"], "batch_stats": upd1["batch_stats"]},
        x * 2.0, use_running_average=False, mutable=["batch_stats"],
    )

    # deferred: moments published, EMA applied outside
    stats = stats0
    for inp in (x, x * 2.0):
        _, upd = mod.apply(
            {"params": variables["params"], "batch_stats": stats},
            inp, use_running_average=False,
            mutable=["batch_stats", "batch_moments"],
        )
        stats = ema_update_batch_stats(
            upd["batch_stats"], upd["batch_moments"]
        )

    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats[k]), np.asarray(upd2["batch_stats"][k]),
            rtol=1e-6, atol=1e-7,
        )


def test_bn_bf16_folded_apply_close_to_f32():
    """The folded bf16 apply path must stay within bf16 rounding of the f32
    parity path."""
    from titanet_tpu.ops.norm import BatchNorm

    x = jnp.asarray(_rand(8, 12, 16, seed=5))
    f32 = BatchNorm()
    bf16 = BatchNorm(dtype=jnp.bfloat16)
    variables = f32.init(jax.random.key(0), x, use_running_average=False)
    ref, _ = f32.apply(variables, x, use_running_average=False,
                       mutable=["batch_stats"])
    out, _ = bf16.apply(variables, x.astype(jnp.bfloat16),
                        use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.02, atol=0.02
    )


def test_depthwise_custom_vjp_grads_match_xla():
    """depthwise_conv1d_same's shifted-adds backward vs XLA's conv grads."""
    from titanet_tpu.ops.conv import conv1d_same, depthwise_conv1d_same

    rng = np.random.default_rng(11)
    B, T, C, K = 3, 19, 8, 5
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((K, 1, C)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    ref_loss = lambda x, k, b: jnp.sum(conv1d_same(x, k, b, groups=C) * g)
    new_loss = lambda x, k, b: jnp.sum(depthwise_conv1d_same(x, k, b) * g)

    np.testing.assert_allclose(
        np.asarray(new_loss(x, k, b)), np.asarray(ref_loss(x, k, b)), rtol=1e-5
    )
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(x, k, b)
    new_grads = jax.grad(new_loss, argnums=(0, 1, 2))(x, k, b)
    for gr, gn, name in zip(ref_grads, new_grads, "x kernel bias".split()):
        np.testing.assert_allclose(
            np.asarray(gn), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_fast_dropout_bit_plane_pool():
    """Bit-plane mode: keep fraction ~0.5, x2 scaling, and independent
    masks across planes of the same pool word."""
    from titanet_tpu.ops.norm import FastDropout

    x = jnp.ones((64, 256), jnp.float32)
    pool = jax.random.bits(jax.random.key(3), (1, 64, 256), jnp.uint8)
    outs = []
    for site in (0, 5):
        mod = FastDropout(rate=0.5, site=site)
        out = np.asarray(mod.apply({}, x, pool=pool))
        kept = out != 0.0
        np.testing.assert_allclose(out[kept], 2.0, rtol=1e-6)
        n = out.size
        assert abs(kept.mean() - 0.5) < 4 * (0.25 / n) ** 0.5
        outs.append(kept)
    # planes of one byte must be (near) independent
    corr = np.corrcoef(outs[0].ravel(), outs[1].ravel())[0, 1]
    assert abs(corr) < 0.05
    # a site outside bit-plane eligibility (rate != 0.5) ignores the pool
    mod = FastDropout(rate=0.3, site=0)
    out = mod.apply({}, x, pool=pool, rngs={"dropout": jax.random.key(0)})
    kept = np.asarray(out) != 0.0
    assert abs(kept.mean() - 0.7) < 4 * (0.21 / x.size) ** 0.5
