"""Device-resident corpus mode (data/device_corpus.py): descriptor
batches must reproduce the host loader's batches exactly (composition,
crops, buckets, zero padding) up to int16 PCM quantization."""

import jax.numpy as jnp
import numpy as np
import pytest

from titanet_tpu.data.dataset import SyntheticSpeakerDataset
from titanet_tpu.data.device_corpus import (
    DeviceBatch,
    DeviceCorpus,
    corpus_cache_key,
    resolve_base,
)
from titanet_tpu.data.loader import ChunkConfig, DataLoader, SpeedConfig


def _dataset():
    return SyntheticSpeakerDataset(
        n_speakers=6, utterances_per_speaker=5, seed=7,
        min_seconds=1.0, max_seconds=3.4,
    )


def _corpus(ds):
    root, _ = resolve_base(ds)
    return DeviceCorpus.build(root, 16000, cache_key=None)


def _pair(ds, **kw):
    host = DataLoader(ds, **kw)
    dev = DataLoader(ds, **kw)
    dev.attach_device_corpus(_corpus(ds))
    return host, dev


def _assert_batches_match(hb, db):
    assert isinstance(db, DeviceBatch)
    assert hb.waveform.shape == (len(db), db.t)
    np.testing.assert_array_equal(hb.speaker_ids, db.speaker_ids)
    np.testing.assert_array_equal(hb.lengths, db.lengths)
    wav_dev, lengths, speakers = db.gather()
    assert wav_dev.dtype == jnp.int16
    got = np.asarray(wav_dev, np.float32) / 32768.0
    np.testing.assert_allclose(got, hb.waveform, atol=1.0 / 32768.0)
    np.testing.assert_array_equal(np.asarray(lengths), hb.lengths)
    np.testing.assert_array_equal(np.asarray(speakers), hb.speaker_ids)


@pytest.mark.parametrize("epoch", [0, 3])
def test_train_loader_parity_with_chunking(epoch):
    ds = _dataset()
    host, dev = _pair(
        ds, batch_size=4, shuffle=True, seed=11,
        chunk=ChunkConfig(enabled=True, max_length=2.0, lengths=(1.0, 1.5, 2.0)),
    )
    host.set_epoch(epoch)
    dev.set_epoch(epoch)
    host_batches = list(host._iter_batches())
    dev_batches = list(dev._iter_batches())
    assert len(host_batches) == len(dev_batches) > 0
    for hb, db in zip(host_batches, dev_batches):
        _assert_batches_match(hb, db)


def test_eval_loader_parity_whole_utterances():
    ds = _dataset()
    train, val, test = ds.get_splits(
        val=True, val_utterances_per_speaker=1,
        test=True, test_speakers=2, test_utterances_per_speaker=3,
    )
    sub = ds.subset(test) if hasattr(ds, "subset") else None
    from titanet_tpu.data.dataset import Subset

    sub = Subset(ds, test)
    host, dev = _pair(
        sub, batch_size=4, shuffle=False, drop_last=False,
        chunk=ChunkConfig(enabled=False),
    )
    host_batches = list(host._iter_batches())
    dev_batches = list(dev._iter_batches())
    assert len(host_batches) == len(dev_batches) > 0
    for hb, db in zip(host_batches, dev_batches):
        _assert_batches_match(hb, db)


def test_host_augmentation_refuses_device_mode():
    ds = _dataset()
    loader = DataLoader(ds, batch_size=4, speed=SpeedConfig(enabled=True))
    with pytest.raises(ValueError, match="host-side"):
        loader.attach_device_corpus(_corpus(ds))


def test_corpus_cache_key_shared_for_identical_synthetic():
    a, b = _dataset(), _dataset()
    assert corpus_cache_key(a) == corpus_cache_key(b)
    assert corpus_cache_key(a)[0] == "synthetic"


def test_staged_batches_feed_train_step():
    """End-to-end: device descriptors -> _staged_batches -> one fused
    train step (the loop integration surface)."""
    import jax

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer, train_step
    from titanet_tpu.train.loop import _staged_batches

    ds = _dataset()
    loader = DataLoader(
        ds, batch_size=4, shuffle=True, seed=3,
        chunk=ChunkConfig(enabled=True, max_length=1.0, lengths=(1.0,)),
    )
    loader.attach_device_corpus(_corpus(ds))
    model = get_titanet(model_size="s", n_mega_blocks=2)
    head = build_head("ce", embedding_size=192, n_classes=6)
    frontend = FrontendConfig.from_ms()
    optimizer = make_optimizer(name="adam", start_lr=1e-3)
    state = None
    for (wav, lengths, speakers), batch in _staged_batches(loader):
        assert wav.shape[0] == 4 and wav.dtype == jnp.int16
        if state is None:
            from titanet_tpu.ops.frontend import log_mel_spectrogram

            mel, _ = jax.jit(
                lambda w: log_mel_spectrogram(
                    w.astype(jnp.float32) / 32768.0, frontend
                )
            )(wav)
            state = create_train_state(
                jax.random.key(0), model=model, head=head, optimizer=optimizer,
                example_mel=mel, n_classes=6,
            )
        state, metrics = train_step(
            state, wav, lengths, speakers,
            model=model, head=head, optimizer=optimizer, frontend=frontend,
        )
        assert np.isfinite(float(metrics["loss"]))
        break
