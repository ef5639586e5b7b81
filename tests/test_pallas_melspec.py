"""Fused Pallas mel kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

CFG = FrontendConfig.from_ms()


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_melspec_matches_jnp():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 24000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(wav, CFG)
    out, _ = log_mel_spectrogram_pallas(wav, CFG)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_pallas_melspec_masking():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas

    rng = np.random.default_rng(1)
    wav = np.zeros((2, 24000), np.float32)
    wav[0] = rng.standard_normal(24000) * 0.1
    wav[1, :16000] = rng.standard_normal(16000) * 0.1
    lengths = jnp.asarray([24000, 16000])
    ref, rmask = log_mel_spectrogram(jnp.asarray(wav), CFG, lengths=lengths)
    out, mask = log_mel_spectrogram_pallas(jnp.asarray(wav), CFG, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(rmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_pallas_fused_framing_matches_jnp():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas_fused

    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 24000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(wav, CFG)
    out, _ = log_mel_spectrogram_pallas_fused(wav, CFG)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_pallas_fused_framing_masking():
    from titanet_tpu.ops.pallas.melspec import log_mel_spectrogram_pallas_fused

    rng = np.random.default_rng(3)
    wav = np.zeros((2, 24000), np.float32)
    wav[0] = rng.standard_normal(24000) * 0.1
    wav[1, :16000] = rng.standard_normal(16000) * 0.1
    lengths = jnp.asarray([24000, 16000])
    ref, rmask = log_mel_spectrogram(jnp.asarray(wav), CFG, lengths=lengths)
    out, mask = log_mel_spectrogram_pallas_fused(jnp.asarray(wav), CFG, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(rmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_frontend_config_dispatches_to_fused_kernel():
    cfg = FrontendConfig.from_ms(use_pallas_fused=True)
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((2, 24000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(wav, CFG)
    out, _ = log_mel_spectrogram(wav, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)
    # 1D input follows the same squeeze semantics as the jnp path
    ref1, _ = log_mel_spectrogram(wav[0], CFG)
    out1, _ = log_mel_spectrogram(wav[0], cfg)
    assert out1.shape == ref1.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), rtol=2e-3, atol=2e-4)


def test_fused_kernel_nondefault_geometries():
    """Phase decomposition generalizes: hop=80 -> 8 phases; n_fft=256 ->
    fewer spill matmuls; parity vs the jnp path for each."""
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.ops.pallas.melspec import (
        fused_kernel_supports,
        log_mel_spectrogram_pallas_fused,
    )

    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    for cfg in (
        FrontendConfig(n_fft=512, win_length=400, hop_length=80),
        FrontendConfig(n_fft=256, win_length=200, hop_length=160),
    ):
        assert fused_kernel_supports(cfg)
        ref, _ = log_mel_spectrogram(wav, cfg)
        out, _ = log_mel_spectrogram_pallas_fused(wav, cfg)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4,
            err_msg=f"hop={cfg.hop_length} n_fft={cfg.n_fft}",
        )


def test_fused_kernel_unsupported_geometry_falls_back():
    """n_fft > lcm(hop, 128): use_pallas_fused must fall back to XLA."""
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.ops.pallas.melspec import fused_kernel_supports

    cfg = FrontendConfig(n_fft=512, win_length=400, hop_length=128,
                         use_pallas_fused=True)
    assert not fused_kernel_supports(cfg)
    rng = np.random.default_rng(6)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(
        wav, FrontendConfig(n_fft=512, win_length=400, hop_length=128))
    out, _ = log_mel_spectrogram(wav, cfg)  # falls back, no assert/error
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_fused_kernel_misaligned_offset_geometry():
    """hop=40: phase offsets aren't sublane-tile multiples — the math must
    still be exact (hardware compiles misaligned sublane reads via
    relayouts; interpret mode checks the decomposition itself)."""
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.ops.pallas.melspec import (
        fused_kernel_supports,
        log_mel_spectrogram_pallas_fused,
    )

    cfg = FrontendConfig(n_fft=512, win_length=400, hop_length=40)
    assert fused_kernel_supports(cfg)
    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.standard_normal((1, 8000)) * 0.1, jnp.float32)
    ref, _ = log_mel_spectrogram(wav, cfg)
    out, _ = log_mel_spectrogram_pallas_fused(wav, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Fused attentive-pooling kernel (ops/pallas/pool.py)
# ---------------------------------------------------------------------------


def test_attentive_pool_fused_matches_jnp_fwd_and_grads():
    """Kernel (interpret mode on CPU) vs the jnp parity path: outputs and
    ALL gradients, f32."""
    import numpy as np

    from titanet_tpu.ops.pallas.pool import attentive_pool_fused
    from titanet_tpu.ops.pooling import attentive_stats

    rng = np.random.default_rng(0)
    B, T, C, H = 3, 17, 256, 128
    y = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((C, H)) * 0.05, jnp.float32)
    ba = jnp.asarray(rng.standard_normal((H,)) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((H, C)) * 0.05, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

    def ref(y, wa, ba, wb, bb):
        e = jnp.tanh(y @ wa + ba) @ wb + bb
        return attentive_stats(y, e)

    zeros = jnp.zeros((C,), jnp.float32)

    def ker(y, wa, ba, wb, bb):
        return attentive_pool_fused(y, zeros, zeros, wa, ba, wb, bb, 1e-6, 2, False)

    out_r = ref(y, wa, ba, wb, bb)
    out_k = ker(y, wa, ba, wb, bb)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)

    g = jnp.asarray(rng.standard_normal(out_r.shape), jnp.float32)
    loss_r = lambda *a: jnp.sum(ref(*a) * g)
    loss_k = lambda *a: jnp.sum(ker(*a) * g)
    grads_r = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(y, wa, ba, wb, bb)
    grads_k = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(y, wa, ba, wb, bb)
    for gr, gk, name in zip(grads_r, grads_k, "y wa ba wb bb".split()):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_attentive_pool_module_param_paths_unchanged():
    """The _DenseParams refactor must keep the exact param tree (and
    values — flax path-derived RNG) the nn.Dense children produced."""
    from titanet_tpu.ops.pooling import AttentiveStatsPooling

    mod = AttentiveStatsPooling(hidden_size=128)
    x = jnp.zeros((2, 9, 256), jnp.float32)
    params = mod.init(jax.random.key(0), x)["params"]
    assert set(params) == {"in_linear", "out_linear"}
    assert params["in_linear"]["kernel"].shape == (256, 128)
    assert params["in_linear"]["bias"].shape == (128,)
    assert params["out_linear"]["kernel"].shape == (128, 256)
    assert params["out_linear"]["bias"].shape == (256,)


def test_attentive_pool_fused_fold_matches_jnp():
    """fold=True (epilog BN apply + relu absorbed in-kernel) vs the
    explicit relu(a*h+c) -> jnp pool chain: outputs and ALL gradients."""
    import numpy as np

    from titanet_tpu.ops.pallas.pool import attentive_pool_fused
    from titanet_tpu.ops.pooling import attentive_stats

    rng = np.random.default_rng(5)
    B, T, C, H = 2, 13, 256, 128
    h = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((C,)) * 0.2, jnp.float32)
    wa = jnp.asarray(rng.standard_normal((C, H)) * 0.05, jnp.float32)
    ba = jnp.asarray(rng.standard_normal((H,)) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((H, C)) * 0.05, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

    def ref(h, a, c, wa, ba, wb, bb):
        y = jax.nn.relu(h * a + c)
        e = jnp.tanh(y @ wa + ba) @ wb + bb
        return attentive_stats(y, e)

    def ker(h, a, c, wa, ba, wb, bb):
        return attentive_pool_fused(h, a, c, wa, ba, wb, bb, 1e-6, 2, True)

    np.testing.assert_allclose(
        np.asarray(ker(h, a, c, wa, ba, wb, bb)),
        np.asarray(ref(h, a, c, wa, ba, wb, bb)),
        rtol=2e-5, atol=2e-5,
    )
    g = jnp.asarray(rng.standard_normal((B, 2 * C)), jnp.float32)
    args = (h, a, c, wa, ba, wb, bb)
    grads_r = jax.grad(lambda *A: jnp.sum(ref(*A) * g), argnums=tuple(range(7)))(*args)
    grads_k = jax.grad(lambda *A: jnp.sum(ker(*A) * g), argnums=tuple(range(7)))(*args)
    for gr, gk, name in zip(grads_r, grads_k, "h a c wa ba wb bb".split()):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_titanet_defer_epilog_equals_unfused():
    """Encoder(defer_epilog=True) returns (h, a, c) with
    relu(a*h+c) == the unfused epilog output (eval mode, CPU path)."""
    import numpy as np

    from titanet_tpu.models.titanet import Encoder

    enc = Encoder(n_mega_blocks=1, hidden_size=32, output_size=48,
                  dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 9, 16)),
                    jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    full = enc.apply(variables, x, train=False)
    h, a, c = enc.apply(variables, x, train=False, defer_epilog=True)
    np.testing.assert_allclose(
        np.asarray(jax.nn.relu(h * a + c)), np.asarray(full),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("t", [301, 608, 1500, 3000])
def test_attentive_pool_fused_long_T_regression(t):
    """r3 OOM regression (CLAUDE.md): eval sees UNCHUNKED utterances at
    T~600+ and a fixed batch tile blew the Mosaic VMEM stack. Covers the
    module path (which owns the T-scaled tile selection) in interpret
    mode at long T: fwd + all grads vs the jnp path, plus the tile-
    scaling invariant that bounds the kernel's per-step VMEM footprint."""
    import numpy as np

    from titanet_tpu.ops.pooling import AttentiveStatsPooling

    B, C, H = 2, 256, 128
    rng = np.random.default_rng(t)
    x = jnp.asarray(rng.standard_normal((B, t, C)) * 0.5, jnp.float32)
    ker_mod = AttentiveStatsPooling(hidden_size=H, use_kernel=True)
    jnp_mod = AttentiveStatsPooling(hidden_size=H, use_kernel=False)
    v = ker_mod.init(jax.random.key(0), x)

    out_k = ker_mod.apply(v, x)
    out_r = jnp_mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)

    def loss(mod):
        return lambda v, x: jnp.sum(mod.apply(v, x) ** 2)

    gv_k, gx_k = jax.grad(loss(ker_mod), argnums=(0, 1))(v, x)
    gv_r, gx_r = jax.grad(loss(jnp_mod), argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=2e-3, atol=2e-3, err_msg="grad x")
    for (pk, gk), (pr, gr) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gv_k), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gv_r), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"grad param {pk}",
        )

    # Tile-scaling invariant (pooling.py): bt*T stays at/below the measured
    # safe working point (base tile x T=310) for both dtype bases, so the
    # kernel's dominant per-step VMEM temps (~bt*T*C f32 rows) are bounded
    # independent of utterance length. The bwd kernel additionally halves bt.
    for base in (4, 2):  # bf16 fwd base, f32 fwd base
        bt = max(1, min(base, (base * 310) // t))
        assert bt >= 1 and bt * t <= max(base * 310, t), (base, bt, t)


@pytest.mark.parametrize("k", [3, 7, 11])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_depthwise_fused_bwd_matches_xla_grads(k, dtype):
    """ops/pallas/dwconv.py: the single-pass Pallas backward must match
    XLA's grouped-conv gradients (interpret mode off-TPU)."""
    from titanet_tpu.ops.conv import conv1d_same
    from titanet_tpu.ops.pallas.dwconv import depthwise_conv1d_fused_bwd

    b, t, c = 3, 37, 128
    key = jax.random.PRNGKey(k)
    kx, kw, kb, kg = jax.random.split(key, 4)
    x = jax.random.normal(kx, (b, t, c), dtype)
    w = jax.random.normal(kw, (k, 1, c), jnp.float32) * 0.3
    bias = jax.random.normal(kb, (c,), jnp.float32) * 0.1
    g = jax.random.normal(kg, (b, t, c), dtype)

    ref = lambda x, w, bias: jnp.sum(
        conv1d_same(x, w, bias, groups=c).astype(jnp.float32) * g.astype(jnp.float32)
    )
    fused = lambda x, w, bias: jnp.sum(
        depthwise_conv1d_fused_bwd(x, w, bias).astype(jnp.float32)
        * g.astype(jnp.float32)
    )
    out_ref = conv1d_same(x, w, bias, groups=c)
    out_fused = depthwise_conv1d_fused_bwd(x, w, bias)
    np.testing.assert_allclose(out_fused, out_ref, rtol=0, atol=0)

    gr = jax.grad(ref, argnums=(0, 1, 2))(x, w, bias)
    gf = jax.grad(fused, argnums=(0, 1, 2))(x, w, bias)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    for a, e, name in zip(gf, gr, ("dx", "dk", "db")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e, np.float32),
            rtol=tol, atol=tol * np.abs(np.asarray(e)).max(),
            err_msg=name,
        )


def test_depthwise_fused_bwd_routing_env(monkeypatch):
    """TITANET_DW_BWD=pallas routes eligible bf16 depthwise convs in
    SamePadConv1d; default stays on XLA (param tree unchanged)."""
    from titanet_tpu.ops.conv import SamePadConv1d

    x = jnp.ones((2, 16, 128), jnp.bfloat16)
    mod = SamePadConv1d(features=128, kernel_size=3, groups=128,
                        dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_xla = mod.apply(params, x)
    monkeypatch.setenv("TITANET_DW_BWD", "pallas")
    y_pallas = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_pallas, np.float32), np.asarray(y_xla, np.float32)
    )
