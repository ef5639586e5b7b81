"""Int8 quantized serving path vs the f32 flax path (CPU).

Quantization error bound: per-channel int8 weights + per-row dynamic int8
activations keep unit-norm embedding cosine similarity high; the EER impact
is measured separately on the hard corpus (docs/eer_bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.models import TitaNet, l2_normalize
from titanet_tpu.models.quantized import (
    QuantLinear,
    quantize_titanet,
    quantized_matmul,
    titanet_apply_quantized,
)


def _model_and_vars(n_mega=2, hidden=128, k=3, seed=0, simple_pool=False):
    model = TitaNet(
        n_mega_blocks=n_mega, encoder_hidden_size=hidden, encoder_output_size=192,
        embedding_size=32, mega_block_kernel_size=k, attention_hidden_size=16,
        dropout=0.0, simple_pool=simple_pool,
    )
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, 64, 80)), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.key(seed), x)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a
            + 0.05 * np.random.default_rng(1).standard_normal(a.shape).astype(a.dtype),
            variables["batch_stats"],
        ),
    }
    return model, variables, x


def _cosine(a, b):
    a = np.asarray(l2_normalize(a))
    b = np.asarray(l2_normalize(b))
    return np.sum(a * b, axis=-1)


def test_quantized_matmul_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((96, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 96)), jnp.float32)
    from titanet_tpu.models.quantized import _quantize_weight

    q = _quantize_weight(w, b)
    assert q.w_q.dtype == jnp.int8
    ref = np.asarray(x @ w + b[None])
    out = np.asarray(quantized_matmul(x, q))
    # int8 x int8: error scales with the OUTPUT's dynamic range (per-element
    # relative error is unbounded where ref ~ 0), so normalize by ref RMS
    rms = float(np.sqrt(np.mean(ref**2)))
    assert np.sqrt(np.mean((out - ref) ** 2)) / rms < 0.02
    assert np.abs(out - ref).max() / rms < 0.12


def test_quantized_titanet_embedding_cosine():
    model, variables, x = _model_and_vars()
    ref = model.apply(variables, x, train=False)
    q = quantize_titanet(model, variables)
    out = jax.jit(titanet_apply_quantized)(q, x)
    assert out.shape == ref.shape
    cos = _cosine(out, ref)
    assert (cos > 0.99).all(), cos


def test_quantized_titanet_from_scan_layout():
    """quantize_titanet auto-unstacks scan_blocks variables; the result is
    leaf-identical to quantizing the equivalent unrolled variables."""
    from titanet_tpu.models import stack_mega_block_params

    model, variables, x = _model_and_vars()
    q_ref = quantize_titanet(model, variables)
    svars = {k: stack_mega_block_params(variables[k], model.n_mega_blocks)
             for k in variables}
    q_scan = quantize_titanet(model.clone(scan_blocks=True), svars)
    for a, b in zip(jax.tree.leaves(q_ref), jax.tree.leaves(q_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_titanet_masked():
    model, variables, x = _model_and_vars(n_mega=1)
    mask = jnp.ones((2, 64)).at[1, 40:].set(0.0)
    ref = model.apply(variables, x, train=False, mask=mask)
    q = quantize_titanet(model, variables)
    out = titanet_apply_quantized(q, x, mask=mask)
    cos = _cosine(out, ref)
    assert (cos > 0.99).all(), cos


def test_quantized_titanet_simple_pool():
    model, variables, x = _model_and_vars(n_mega=1, simple_pool=True)
    ref = model.apply(variables, x, train=False)
    q = quantize_titanet(model, variables)
    out = titanet_apply_quantized(q, x)
    cos = _cosine(out, ref)
    assert (cos > 0.99).all(), cos
