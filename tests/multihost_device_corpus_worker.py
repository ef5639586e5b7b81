"""Worker for the two-process SHARDED device-corpus test
(tests/test_multiprocess_device_corpus.py).

Each process decodes and uploads ONLY its static utterance slice
(loader.device_shard_root_indices()), composes batches from that slice,
and runs sharded train steps over the global 8-device mesh with
device-side global-batch assembly (DeviceBatch.gather_global — waveform
bytes never revisit the host). Writes losses, the owned root indices,
corpus shard sizes, per-step plan fingerprints, and a params checksum.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = sys.argv[1]
    n_steps = int(sys.argv[2])

    import jax
    import jax.numpy as jnp

    from titanet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(), "env contract missing"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.device_corpus import DeviceCorpus, resolve_base
    from titanet_tpu.data.loader import ChunkConfig, DataLoader
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer, train_step

    ds = SyntheticSpeakerDataset(
        n_speakers=8, utterances_per_speaker=6,
        min_seconds=1.0, max_seconds=1.0, seed=7,
    )
    loader = DataLoader(
        ds, batch_size=8, shuffle=True, chunk=ChunkConfig(enabled=False),
        seed=3, num_workers=0,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    loader.set_epoch(0)
    root, _ = resolve_base(loader.dataset)
    shard_root = loader.device_shard_root_indices()
    corpus = DeviceCorpus.build(
        root, 16000, root_indices=shard_root, tail_pad=32000
    )
    loader.attach_device_corpus(corpus)

    frontend = FrontendConfig.from_ms()
    model = get_titanet(
        model_size="s", n_mega_blocks=1, embedding_size=64,
        attention_hidden_size=128, dropout=0.5,
    )
    head = build_head("ce", 64, ds.get_num_speakers())
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt,
        jnp.zeros((2, frontend.num_frames(16000), 80)),
        ds.get_num_speakers(),
    )

    mesh = make_mesh()
    sharding = batch_sharding(mesh)

    losses, plans = [], []
    it = iter(loader)
    for _ in range(n_steps):
        batch = next(it)
        # fingerprint of this host's descriptor plan (starts/lengths/spk)
        plans.append(hashlib.sha1(
            np.concatenate([
                np.asarray(batch.starts, np.int64),
                np.asarray(batch.lengths, np.int64),
                np.asarray(batch.speaker_ids, np.int64),
            ]).tobytes()
        ).hexdigest())
        wav, lengths, spk = batch.gather_global(sharding)
        state, metrics = train_step(
            state, wav, None, spk,
            model=model, head=head, optimizer=opt, frontend=frontend,
        )
        losses.append(metrics["loss"])
    losses = [float(l) for l in losses]

    leaves = jax.tree.leaves(jax.device_get(state.params))
    checksum = float(sum(np.float64(np.sum(np.abs(l))) for l in leaves))

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": jax.process_index(),
                "losses": losses,
                "plans": plans,
                "owned_root": [int(i) for i in shard_root],
                "corpus_owned": int(corpus.n_owned),
                "corpus_samples": int(corpus.flat.shape[0]),
                "steps_per_epoch": len(loader),
                "checksum": checksum,
                "global_devices": jax.device_count(),
            },
            f,
        )
    print("worker done", jax.process_index())


if __name__ == "__main__":
    main()
