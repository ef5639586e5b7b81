"""Fused Pallas inference path vs the flax path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.models import TitaNet
from titanet_tpu.models.fused_inference import titanet_apply_fused


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _model_and_vars(n_mega=2, hidden=128, out=192, k=3, seed=0):
    model = TitaNet(
        n_mega_blocks=n_mega, encoder_hidden_size=hidden, encoder_output_size=out,
        embedding_size=32, mega_block_kernel_size=k, attention_hidden_size=16,
        dropout=0.0,
    )
    x = jnp.asarray(np.random.default_rng(seed).standard_normal((2, 64, 80)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(seed), x)
    # perturb batch_stats away from init so BN folding is actually exercised
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a + 0.05 * np.random.default_rng(1).standard_normal(a.shape).astype(a.dtype),
            variables["batch_stats"],
        ),
    }
    return model, variables, x


def test_fused_matches_flax_path():
    model, variables, x = _model_and_vars()
    ref = model.apply(variables, x, train=False)
    out = titanet_apply_fused(model, variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-4)


def test_fused_matches_with_mask_and_k7():
    model, variables, x = _model_and_vars(n_mega=1, hidden=128, k=7)
    mask = jnp.ones((2, 64)).at[1, 40:].set(0.0)
    ref = model.apply(variables, x, train=False, mask=mask)
    out = titanet_apply_fused(model, variables, x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-4)


def test_fused_blocked_time_tiling():
    """block_t smaller than T exercises the halo/window logic."""
    model, variables, x = _model_and_vars(n_mega=1, hidden=128, k=3)
    ref = model.apply(variables, x, train=False)
    out = titanet_apply_fused(model, variables, x, block_t=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-4)


def test_fused_matches_flax_path_bf16():
    """model.dtype=bf16 serving: the fused path must honor the compute
    dtype (round 5 — an f32 activation stream VMEM-OOMs the kernel at
    B=512 and is 2x the HBM traffic; see BENCHMARKS.md B-sweep)."""
    model, variables, x = _model_and_vars()
    model_bf16 = model.clone(dtype=jnp.bfloat16)
    ref = model_bf16.apply(variables, x, train=False)
    out = titanet_apply_fused(model_bf16, variables, x)
    assert out.dtype == jnp.bfloat16
    ref_n = np.asarray(ref, np.float32)
    out_n = np.asarray(out, np.float32)
    cos = (ref_n * out_n).sum(-1) / (
        np.linalg.norm(ref_n, axis=-1) * np.linalg.norm(out_n, axis=-1)
    )
    assert cos.min() > 1 - 1e-3, cos
