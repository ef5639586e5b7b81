"""Baseline-model parity vs the reference torch implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from titanet_tpu.models import DumbConvNet, DVectorBaseline, l2_normalize
from titanet_tpu.utils.torch_compat import convert_dvector_state_dict


@pytest.fixture(scope="module")
def ref_models(reference_src):
    import models as ref_models

    return ref_models


def test_dvector_matches_reference(ref_models):
    torch.manual_seed(0)
    tmodel = ref_models.DVectorBaseline(
        80, n_lstm_layers=2, hidden_size=32, lstm_average=True,
        embedding_size=16, segment_length=40,
    )
    tmodel.eval()
    jmodel = DVectorBaseline(
        n_lstm_layers=2, hidden_size=32, lstm_average=True,
        embedding_size=16, segment_length=40,
    )
    params = {"params": jax.tree.map(
        jnp.asarray, convert_dvector_state_dict(tmodel.state_dict())
    )}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 80, 100)).astype(np.float32)  # [B, M, T]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()  # normalized
    out = jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    ours = np.asarray(l2_normalize(out))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dvector_short_input_padding(ref_models):
    """Inputs shorter than one segment are right-padded (reference
    src/models.py:119-122)."""
    torch.manual_seed(1)
    tmodel = ref_models.DVectorBaseline(
        80, n_lstm_layers=1, hidden_size=16, embedding_size=8, segment_length=50
    )
    tmodel.eval()
    jmodel = DVectorBaseline(
        n_lstm_layers=1, hidden_size=16, embedding_size=8, segment_length=50
    )
    params = {"params": jax.tree.map(
        jnp.asarray, convert_dvector_state_dict(tmodel.state_dict())
    )}
    x = np.random.default_rng(2).standard_normal((2, 80, 30)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(l2_normalize(jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 1)))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dumbconv_matches_reference(ref_models):
    torch.manual_seed(0)
    tmodel = ref_models.DumbConvNet(80, hidden_size=24, embedding_size=12, n_layers=2)
    tmodel.eval()
    jmodel = DumbConvNet(hidden_size=24, embedding_size=12, n_layers=2)

    sd = tmodel.state_dict()

    def conv_block(i):
        pre = f"conv.{i}.conv_block"
        return (
            {
                "conv": {
                    "kernel": jnp.asarray(sd[f"{pre}.0.weight"].numpy().transpose(2, 1, 0)),
                    "bias": jnp.asarray(sd[f"{pre}.0.bias"].numpy()),
                },
                "norm": {
                    "scale": jnp.asarray(sd[f"{pre}.1.weight"].numpy()),
                    "bias": jnp.asarray(sd[f"{pre}.1.bias"].numpy()),
                },
            },
            {
                "norm": {
                    "mean": jnp.asarray(sd[f"{pre}.1.running_mean"].numpy()),
                    "var": jnp.asarray(sd[f"{pre}.1.running_var"].numpy()),
                }
            },
        )

    p0, s0 = conv_block(0)
    p1, s1 = conv_block(1)
    variables = {
        "params": {
            "conv_0": p0,
            "conv_1": p1,
            "fc": {
                "kernel": jnp.asarray(sd["fc.weight"].numpy().T),
                "bias": jnp.asarray(sd["fc.bias"].numpy()),
            },
        },
        "batch_stats": {"conv_0": s0, "conv_1": s1},
    }
    x = np.random.default_rng(3).standard_normal((2, 80, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        l2_normalize(jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1))))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
