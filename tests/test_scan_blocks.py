"""Encoder(scan_blocks=True): lax.scan over stacked mega-block params.

Asserts the scanned encoder is numerically the SAME function as the
unrolled one given the same weights (via stack_mega_block_params), that
train-mode BN statistics update identically, and that the layout
converters round-trip. Reference architecture: src/models.py:342-472.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.losses import build_head
from titanet_tpu.models import (
    TitaNet,
    stack_mega_block_params,
    unstack_mega_block_params,
)
from titanet_tpu.train import create_train_state, make_optimizer, train_step
from titanet_tpu.ops.frontend import FrontendConfig


def _models(dropout=0.0, n=3):
    kw = dict(
        n_mega_blocks=n,
        encoder_hidden_size=32,
        encoder_output_size=48,
        embedding_size=16,
        attention_hidden_size=8,
        dropout=dropout,
    )
    return TitaNet(**kw), TitaNet(scan_blocks=True, **kw)


def test_scan_blocks_matches_unrolled_eval():
    unrolled, scanned = _models()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 61, 80)), jnp.float32
    )
    v = unrolled.init(jax.random.key(0), x)
    vs = {k: stack_mega_block_params(v[k], 3) for k in v}
    # scan init produces the same tree structure/shapes as the converter
    vs_init = scanned.init(jax.random.key(1), x)
    assert jax.tree.structure(vs_init) == jax.tree.structure(vs)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(vs_init), jax.tree.leaves(vs))
    )
    out_u = unrolled.apply(v, x, train=False)
    out_s = scanned.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s), atol=1e-5)


def test_scan_blocks_train_mode_bn_updates_match():
    # dropout=0 so the only train-mode stochasticity is gone; BN batch
    # statistics (incl. the deferred batch_moments publishing) must match
    unrolled, scanned = _models(dropout=0.0)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 61, 80)), jnp.float32
    )
    v = unrolled.init(jax.random.key(0), x)
    vs = {k: stack_mega_block_params(v[k], 3) for k in v}

    out_u, upd_u = unrolled.apply(
        v, x, train=True, mutable=["batch_stats", "batch_moments"],
        rngs={"dropout": jax.random.key(2)},
    )
    out_s, upd_s = scanned.apply(
        vs, x, train=True, mutable=["batch_stats", "batch_moments"],
        rngs={"dropout": jax.random.key(2)},
    )
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s), atol=1e-5)
    mom_u = stack_mega_block_params(upd_u["batch_moments"], 3)
    flat_u = jax.tree_util.tree_flatten_with_path(mom_u)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(upd_s["batch_moments"])[0])
    assert set(flat_s) == {p for p, _ in flat_u}
    for path, leaf in flat_u:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), atol=1e-5, err_msg=str(path)
        )


def test_stack_unstack_roundtrip():
    unrolled, _ = _models()
    x = jnp.zeros((1, 31, 80))
    v = unrolled.init(jax.random.key(0), x)
    rt = unstack_mega_block_params(stack_mega_block_params(v["params"], 3))
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(v["params"])[0],
        jax.tree_util.tree_flatten_with_path(rt)[0],
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("remat", [False, True])
def test_scan_blocks_full_train_step(remat):
    """End-to-end: wav -> mel -> scanned TitaNet -> loss -> grads -> update,
    with dropout on (scan splits the dropout rng per iteration)."""
    model = TitaNet(
        n_mega_blocks=3, encoder_hidden_size=32, encoder_output_size=48,
        embedding_size=16, attention_hidden_size=8, dropout=0.5,
        scan_blocks=True, remat=remat,
    )
    head = build_head("ce", 16, 4)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16000)) * 0.1, jnp.float32
    )
    state2, metrics = train_step(
        state, wav, jnp.asarray([16000, 12000, 16000, 8000]),
        jnp.asarray([0, 1, 2, 3]), model=model, head=head, optimizer=opt,
        frontend=FrontendConfig(),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually moved (scan grads flow into the stacked tree)
    stacked = state2.params["backbone"]["encoder"]["mega_blocks"]
    assert any(
        float(jnp.abs(l).max()) > 0
        for l in jax.tree.leaves(jax.tree.map(jnp.asarray, stacked))
    )
