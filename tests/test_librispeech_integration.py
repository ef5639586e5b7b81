"""Full real-data path integration: a synthetic LibriSpeech-layout corpus of
FLAC files (written by the spec-based fixture encoder) -> native C++ FLAC
decode -> SpeakerDataset -> loader -> one training step."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.flac_fixture import encode_flac

needs_compiler = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ compiler"
)


@pytest.fixture(scope="module")
def librispeech_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls_root")
    base = root / "LibriSpeech" / "train-clean-100"
    rng = np.random.default_rng(0)
    # 3 speakers x 4 utterances, proper <spk>/<chapter>/<spk>-<chapter>-<utt>.flac
    for spk in (19, 26, 32):
        chapter = 100 + spk
        d = base / str(spk) / str(chapter)
        d.mkdir(parents=True)
        for utt in range(4):
            n = int(rng.uniform(1.0, 1.6) * 16000)
            tone = np.sin(2 * np.pi * (100 + spk) * np.arange(n) / 16000)
            pcm = (tone * 8000 + rng.standard_normal(n) * 100).astype(np.int64)
            blob = encode_flac(pcm[None, :], sample_rate=16000, mode="fixed2")
            (d / f"{spk}-{chapter}-{utt:04d}.flac").write_bytes(blob)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(repo, "native"), "-s"], check=True)
    return str(root)


@needs_compiler
def test_librispeech_dataset_walks_and_decodes(librispeech_root):
    from titanet_tpu.data import LibriSpeechDataset

    ds = LibriSpeechDataset(librispeech_root)
    assert len(ds) == 12
    assert ds.get_num_speakers() == 3
    assert sorted(ds.speakers) == [19, 26, 32]
    ex = ds[0]
    assert ex["sample_rate"] == 16000
    assert ex["waveform"].shape[0] == 1 and ex["waveform"].shape[1] > 15000
    assert np.isfinite(ex["waveform"]).all()
    # speaker ids map correctly through paths
    assert ex["speaker"] == 19 and ex["speaker_id"] == ds.speakers_to_id[19]


@needs_compiler
def test_librispeech_end_to_end_training_step(librispeech_root):
    from titanet_tpu.data import ChunkConfig, DataLoader, LibriSpeechDataset, get_datasets
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import DumbConvNet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer, train_step

    train_ds, val_ds, test_ds, n_speakers = get_datasets(
        librispeech_root, name="librispeech",
        val_utterances_per_speaker=1, test_speakers=2,
        test_utterances_per_speaker=1,
    )
    assert n_speakers == 3
    loader = DataLoader(
        train_ds, batch_size=4, chunk=ChunkConfig(max_length=1.2, lengths=(1.0,),
                                                  enabled=True), prefetch=1,
    )
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ce", 8, n_speakers)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), n_speakers
    )
    batch = next(iter(loader))
    state, metrics = train_step(
        state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
        jnp.asarray(batch.speaker_ids),
        model=model, head=head, optimizer=opt, frontend=FrontendConfig.from_ms(),
    )
    assert np.isfinite(float(metrics["loss"]))
