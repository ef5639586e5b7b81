"""Explicit shard_map train step vs the GSPMD path on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from titanet_tpu.losses.heads import build_head
from titanet_tpu.models import TitaNet
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.parallel import make_mesh
from titanet_tpu.parallel.shard_map_step import (
    make_shard_map_train_step,
    replicate_state,
)
from titanet_tpu.train import create_train_state, make_optimizer
from titanet_tpu.train.state import train_step

FRONTEND = FrontendConfig.from_ms()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_matches_gspmd_and_single_device():
    n_classes = 8
    mesh = make_mesh(8)
    # SyncBN via axis_name for the shard_map path
    model_sm = TitaNet(n_mega_blocks=1, encoder_hidden_size=32,
                       encoder_output_size=48, embedding_size=16,
                       attention_hidden_size=8, dropout=0.0, axis_name="data")
    model_sd = TitaNet(n_mega_blocks=1, encoder_hidden_size=32,
                       encoder_output_size=48, embedding_size=16,
                       attention_hidden_size=8, dropout=0.0)
    head = build_head("ce", 16, n_classes)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model_sd, head, opt, jnp.zeros((2, 101, 80)), n_classes
    )
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((16, 16000)) * 0.1, jnp.float32)
    lengths = jnp.full((16,), 16000, jnp.int32)
    speakers = jnp.asarray(rng.integers(0, n_classes, 16), jnp.int32)

    # single-device (global-batch) reference
    state_a = jax.tree.map(jnp.array, state)
    _, m_single = train_step(
        state_a, wav, lengths, speakers,
        model=model_sd, head=head, optimizer=opt, frontend=FRONTEND,
    )

    # shard_map path
    sm_step = make_shard_map_train_step(
        mesh, model=model_sm, head=head, optimizer=opt, frontend=FRONTEND,
    )
    shard = NamedSharding(mesh, P("data"))
    state_b = replicate_state(jax.tree.map(jnp.array, state), mesh)
    new_state, m_sm = sm_step(
        state_b,
        jax.device_put(wav, shard),
        jax.device_put(lengths, shard),
        jax.device_put(speakers, shard),
    )
    # same loss as the single-device global-batch step (SyncBN + pmean grads)
    np.testing.assert_allclose(
        float(m_sm["loss"]), float(m_single["loss"]), rtol=2e-5
    )
    assert int(new_state.step) == 1
    assert np.isfinite(float(m_sm["loss"]))

    # one more step runs on the donated state without error
    new_state, m2 = sm_step(
        new_state,
        jax.device_put(wav, shard),
        jax.device_put(lengths, shard),
        jax.device_put(speakers, shard),
    )
    assert int(new_state.step) == 2
