"""Two-REAL-process data-parallel training test (VERDICT r2 next #3).

Launches tests/multihost_worker.py twice (CPU backend, 4 virtual devices
each, coordinator on localhost) and asserts the multi-host contract:

- both processes complete the same number of sharded steps,
- their per-step losses are identical (the loss is a replicated global
  value — each host computes the SAME global step),
- their final parameter checksums are identical (the gradient all-reduce
  actually synchronized the replicas),
- the batch slices they consumed are disjoint (loader round-robin),
- the per-step losses match a SINGLE-process run fed the concatenated
  global batches on a local 8-device mesh — the P-process step is the
  same logical computation (GSPMD semantics: global-batch BN, global
  gradient mean).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"proc{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            TITANET_COORDINATOR=f"127.0.0.1:{port}",
            TITANET_NUM_PROCESSES="2",
            TITANET_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
                 str(out), str(N_STEPS)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout = "TIMEOUT"
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(out.read_text()) for out in outs]


def test_two_process_run_completes_and_synchronizes(worker_results):
    r0, r1 = worker_results
    assert r0["global_devices"] == r1["global_devices"] == 8
    assert len(r0["losses"]) == len(r1["losses"]) == N_STEPS
    # replicated loss: both hosts computed the same global step
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    # gradient psum synchronized the replicas
    assert abs(r0["checksum"] - r1["checksum"]) < 1e-6 * max(
        abs(r0["checksum"]), 1.0
    )
    # disjoint round-robin batch coverage
    assert not (set(r0["consumed"]) & set(r1["consumed"]))


def test_matches_single_process_concat_batches(worker_results):
    """One P=2 global step == one single-process step on the concatenated
    batch (8 local devices either way)."""
    import jax
    import jax.numpy as jnp

    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.parallel import batch_sharding, make_mesh
    from titanet_tpu.train import create_train_state, make_optimizer, train_step

    ds = SyntheticSpeakerDataset(
        n_speakers=8, utterances_per_speaker=6,
        min_seconds=1.0, max_seconds=1.0, seed=7,
    )
    loaders = [
        DataLoader(ds, batch_size=8, shuffle=True,
                   chunk=ChunkConfig(enabled=False), seed=3, num_workers=0,
                   shard_id=i, num_shards=2)
        for i in range(2)
    ]
    for ld in loaders:
        ld.set_epoch(0)
    frontend = FrontendConfig.from_ms()
    model = get_titanet(model_size="s", n_mega_blocks=1, embedding_size=64,
                        attention_hidden_size=128, dropout=0.5)
    head = build_head("ce", 64, ds.get_num_speakers())
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt,
        jnp.zeros((2, frontend.num_frames(16000), 80)), ds.get_num_speakers(),
    )
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    its = [iter(ld) for ld in loaders]
    losses = []
    for _ in range(N_STEPS):
        parts = [next(it) for it in its]
        wav = jax.device_put(
            np.concatenate([p.waveform for p in parts]), sharding
        )
        spk = jax.device_put(
            np.concatenate([p.speaker_ids for p in parts]), sharding
        )
        state, metrics = train_step(
            state, wav, None, spk,
            model=model, head=head, optimizer=opt, frontend=frontend,
        )
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(
        losses, worker_results[0]["losses"], rtol=1e-4, atol=1e-5
    )
