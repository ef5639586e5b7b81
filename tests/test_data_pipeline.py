"""Data layer tests: splits, loader determinism, buckets, augmentation
plumbing, pair protocol, download utility."""

import os

import numpy as np
import pytest

from titanet_tpu.data import (
    ChunkConfig,
    DataLoader,
    ReverbConfig,
    SpeedConfig,
    Subset,
    SyntheticSpeakerDataset,
    write_wav,
)


@pytest.fixture(scope="module")
def ds():
    return SyntheticSpeakerDataset(n_speakers=6, utterances_per_speaker=10)


def test_splits_match_reference_semantics(ds):
    """Per-speaker split layout (reference src/datasets.py:191-229):
    first V utterances -> val; next T (first K speakers) -> test; rest train."""
    train, val, test = ds.get_splits(
        val_utterances_per_speaker=2, test_speakers=3, test_utterances_per_speaker=2
    )
    assert len(val) == 6 * 2
    assert len(test) == 3 * 2
    assert len(train) == 60 - len(val) - len(test)
    assert not set(train) & set(val) and not set(val) & set(test)
    # val/test are prefix-positioned per speaker
    for s in ds.speakers[:3]:
        utts = ds.speakers_utterances[s]
        assert utts[0] in val and utts[1] in val
        assert utts[2] in test and utts[3] in test


def test_splits_default_keeps_test_speaker_surplus_in_train(ds):
    """Pin the reference's closed-set property (src/datasets.py:204-217):
    a test speaker's utterances beyond val+test stay in TRAIN."""
    train, _, test = ds.get_splits(
        val_utterances_per_speaker=2, test_speakers=3, test_utterances_per_speaker=2
    )
    for s in ds.speakers[:3]:
        surplus = ds.speakers_utterances[s][4:]  # beyond 2 val + 2 test
        assert surplus and set(surplus) <= set(train)


def test_splits_exclusive_test_speakers_are_unseen(ds):
    """Open-set extension: exclusive_test_speakers=True removes test
    speakers entirely from train AND val, without changing which
    utterances form the test split."""
    train_d, val_d, test_d = ds.get_splits(
        val_utterances_per_speaker=2, test_speakers=3, test_utterances_per_speaker=2
    )
    train, val, test = ds.get_splits(
        val_utterances_per_speaker=2, test_speakers=3,
        test_utterances_per_speaker=2, exclusive_test_speakers=True,
    )
    assert test == test_d  # identical test utterances in both modes
    held_out = {u for s in ds.speakers[:3] for u in ds.speakers_utterances[s]}
    assert not set(train) & held_out and not set(val) & held_out
    # non-test speakers are split identically
    kept = {u for s in ds.speakers[3:] for u in ds.speakers_utterances[s]}
    assert set(train) & kept == set(train_d) & kept
    assert set(val) & kept == set(val_d) & kept


def test_get_datasets_exclusive_routing(ds):
    from titanet_tpu.data import get_datasets

    tr, va, te, n = get_datasets(
        ".", name="synthetic", n_speakers=6, utterances_per_speaker=10,
        val_utterances_per_speaker=2, test_speakers=3,
        test_utterances_per_speaker=2, exclusive_test_speakers=True,
    )
    test_spk, train_spk, val_spk = set(te.speakers), set(tr.speakers), set(va.speakers)
    assert len(test_spk) == 3
    assert not test_spk & train_spk and not test_spk & val_spk


def test_loader_determinism_and_buckets(ds):
    loader = DataLoader(ds, batch_size=8, seed=7,
                        chunk=ChunkConfig(max_length=1.5, enabled=True), prefetch=0)
    loader.set_epoch(3)
    b1 = list(loader)
    loader.set_epoch(3)
    b2 = list(loader)
    assert len(b1) == len(ds) // 8  # drop_last
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x.waveform, y.waveform)
        np.testing.assert_array_equal(x.speaker_ids, y.speaker_ids)
    # bucketed shapes: only a handful of distinct time lengths
    shapes = {b.waveform.shape[1] for b in b1}
    assert shapes <= set(loader.buckets)
    # different epoch -> different order
    loader.set_epoch(4)
    b3 = list(loader)
    assert any(
        not np.array_equal(x.speaker_ids, y.speaker_ids) for x, y in zip(b1, b3)
    )


def test_chunking_respects_max_length(ds):
    loader = DataLoader(ds, batch_size=4,
                        chunk=ChunkConfig(max_length=1.5, lengths=(1.0, 1.5), enabled=True),
                        prefetch=0)
    for batch in loader:
        assert (batch.lengths <= int(1.5 * 16000)).all()
        break


def test_speed_and_reverb_plumbing(tmp_path, ds):
    rng = np.random.default_rng(0)
    rir_path = str(tmp_path / "rir.wav")
    write_wav(rir_path, (rng.standard_normal(800) * 0.1).astype(np.float32), 16000)
    loader = DataLoader(
        ds, batch_size=4, prefetch=0,
        chunk=ChunkConfig(enabled=False),
        speed=SpeedConfig(rates=(0.9, 1.1), probability=1.0, enabled=True),
        reverb=ReverbConfig(rir_paths=(rir_path,), probability=1.0, enabled=True),
    )
    batch = next(iter(loader))
    assert np.isfinite(batch.waveform).all()
    # speed perturb changed lengths vs the raw utterances
    raw = [ds[i]["waveform"].shape[-1] for i in range(4)]
    assert any(l not in raw for l in batch.lengths.tolist())


def test_prefetch_thread_equivalence(ds):
    l0 = DataLoader(ds, batch_size=8, seed=1, prefetch=0)
    l2 = DataLoader(ds, batch_size=8, seed=1, prefetch=2)
    for a, b in zip(l0, l2):
        np.testing.assert_array_equal(a.waveform, b.waveform)


def test_get_sample_pairs_protocol(ds):
    sub = Subset(ds, list(range(6)))
    pairs = list(sub.get_sample_pairs([0, 1, 2]))
    assert len(pairs) == 9  # product incl. self-pairs
    assert pairs[0][2]  # self-pair is same-speaker


def test_download_file_url(tmp_path):
    from titanet_tpu.utils.download import download_url_to_file

    src = tmp_path / "src.bin"
    src.write_bytes(b"hello world")
    dest = str(tmp_path / "out.bin")
    import hashlib

    h = hashlib.sha256(b"hello world").hexdigest()[:16]
    download_url_to_file(f"file://{src}", dest, hash_prefix=h)
    assert open(dest, "rb").read() == b"hello world"
    with pytest.raises(RuntimeError):
        download_url_to_file(f"file://{src}", dest, hash_prefix="deadbeef")
    assert not os.path.exists(dest)


def test_dataset_info(ds):
    info = ds.info()
    assert info["num_speakers"] == 6 and info["num_utterances"] == 60
    assert info["total_duration"] > 0


def test_multihost_sharding_disjoint(ds):
    """Per-host loaders see disjoint interleaved slices covering the epoch."""
    loaders = [
        DataLoader(ds, batch_size=4, seed=9, prefetch=0, shuffle=True,
                   shard_id=i, num_shards=3, chunk=ChunkConfig(enabled=False))
        for i in range(3)
    ]
    seen = []
    for l in loaders:
        l.set_epoch(1)
        ids = []
        for b in l:
            ids.extend(b.speaker_ids.tolist())
        seen.append(len(ids))
    # each shard gets ~1/3 of the data
    assert all(16 <= n <= 20 for n in seen), seen


def test_parallel_workers_equivalence(ds):
    """num_workers decoding must produce identical batches (per-example RNG
    is keyed by epoch position, not decode order)."""
    l0 = DataLoader(ds, batch_size=8, seed=3, prefetch=0, num_workers=0,
                    chunk=ChunkConfig(max_length=1.0, lengths=(1.0,), enabled=True))
    l4 = DataLoader(ds, batch_size=8, seed=3, prefetch=0, num_workers=4,
                    chunk=ChunkConfig(max_length=1.0, lengths=(1.0,), enabled=True))
    l0.set_epoch(2)
    l4.set_epoch(2)
    for a, b in zip(l0, l4):
        np.testing.assert_array_equal(a.waveform, b.waveform)
        np.testing.assert_array_equal(a.lengths, b.lengths)


def test_balanced_sampler_composition(ds):
    loader = DataLoader(ds, batch_size=8, seed=5, prefetch=0,
                        balanced=(4, 2), chunk=ChunkConfig(enabled=False))
    loader.set_epoch(0)
    for batch in loader:
        ids, counts = np.unique(batch.speaker_ids, return_counts=True)
        assert len(ids) == 4 and (counts == 2).all(), (ids, counts)


def test_balanced_sampler_on_subset(ds):
    sub = Subset(ds, list(range(0, 40)))  # speakers 0-3
    loader = DataLoader(sub, batch_size=6, seed=5, prefetch=0,
                        balanced=(3, 2), chunk=ChunkConfig(enabled=False))
    for batch in loader:
        ids, counts = np.unique(batch.speaker_ids, return_counts=True)
        assert len(ids) == 3 and (counts == 2).all()
        assert set(ids.tolist()) <= {0, 1, 2, 3}


def test_get_random_utterances(ds):
    utts, spks = ds.get_random_utterances(
        n_speakers=3, n_utterances_per_speaker=5, seed=42
    )
    assert len(utts) == 15 and len(spks) == 15
    # each utterance actually belongs to its claimed speaker
    for u, s in zip(utts, spks):
        assert u in ds.speakers_utterances[s]
    # deterministic under the same seed
    utts2, _ = ds.get_random_utterances(3, 5, seed=42)
    assert list(utts) == list(utts2)


def test_int16_transport_roundtrip():
    """int16 wire format: loader quantizes, device step dequantizes; the
    resulting mel is within the 16-bit source's own precision of the f32
    path."""
    import jax.numpy as jnp

    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from titanet_tpu.train.state import _dequantize_waveform

    ds = SyntheticSpeakerDataset(n_speakers=2, utterances_per_speaker=2)
    kw = dict(batch_size=4, shuffle=False, drop_last=False,
              chunk=ChunkConfig(enabled=False), prefetch=0, seed=1)
    b16 = next(iter(DataLoader(ds, transport_dtype="int16", **kw)))
    b32 = next(iter(DataLoader(ds, transport_dtype="float32", **kw)))
    assert b16.waveform.dtype == np.int16
    assert b32.waveform.dtype == np.float32
    wav16 = _dequantize_waveform(jnp.asarray(b16.waveform))
    np.testing.assert_allclose(np.asarray(wav16), b32.waveform, atol=1.0 / 32768)
    cfg = FrontendConfig.from_ms()
    mel16, _ = log_mel_spectrogram(wav16, cfg, lengths=jnp.asarray(b16.lengths))
    mel32, _ = log_mel_spectrogram(
        jnp.asarray(b32.waveform), cfg, lengths=jnp.asarray(b32.lengths)
    )
    # log-domain, L2-normalized: quantization noise stays tiny
    assert float(jnp.max(jnp.abs(mel16 - mel32))) < 5e-3


def test_sharded_loader_partitions_batches():
    """Two shards deal whole batches round-robin: interleaving their batch
    sequences reproduces the unsharded epoch prefix; lengths are equal and
    the cosine-schedule step count (len) matches what iteration yields."""
    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader

    ds = SyntheticSpeakerDataset(n_speakers=5, utterances_per_speaker=5)  # 25
    kw = dict(batch_size=4, shuffle=True, seed=3,
              chunk=ChunkConfig(enabled=False), prefetch=0)

    def batch_ids(loader, epoch=2):
        loader.set_epoch(epoch)
        return [b.speaker_ids.tolist() for b in loader]

    full = DataLoader(ds, **kw)
    s0 = DataLoader(ds, shard_id=0, num_shards=2, **kw)
    s1 = DataLoader(ds, shard_id=1, num_shards=2, **kw)
    full_b, b0, b1 = batch_ids(full), batch_ids(s0), batch_ids(s1)
    assert len(b0) == len(b1) == len(s0) == len(s1) == 3  # 25//4//2
    interleaved = [x for pair in zip(b0, b1) for x in pair]
    assert interleaved == full_b[: len(interleaved)]


def test_sharded_balanced_loader_keeps_nxm_structure():
    """Sharding must not break GE2E's N speakers x M utterances batches."""
    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader

    ds = SyntheticSpeakerDataset(n_speakers=8, utterances_per_speaker=6)  # 48
    n_spk, m_utt = 4, 3
    kw = dict(batch_size=n_spk * m_utt, balanced=(n_spk, m_utt), seed=5,
              chunk=ChunkConfig(enabled=False), prefetch=0)
    for shard in (0, 1):
        loader = DataLoader(ds, shard_id=shard, num_shards=2, **kw)
        loader.set_epoch(1)
        n_seen = 0
        for batch in loader:
            ids = batch.speaker_ids.reshape(n_spk, m_utt)
            # each group of m_utt rows is one speaker
            assert all(len(set(row.tolist())) == 1 for row in ids)
            n_seen += 1
        assert n_seen == len(loader) == (48 // (n_spk * m_utt)) // 2


def test_subset_honors_full_speaker_dataset_protocol():
    """Views re-derive speakers_utterances in local indices: splits,
    sampling, info and duration stats all work on a Subset, and the
    speaker-id mapping stays the parent's."""
    from titanet_tpu.data.dataset import Subset, SyntheticSpeakerDataset

    full = SyntheticSpeakerDataset(n_speakers=4, utterances_per_speaker=6)
    # a view holding utterances 1..4 of speakers 1 and 3
    picked = [i for s in (1, 3) for i in full.speakers_utterances[s][1:5]]
    view = Subset(full, picked)
    assert len(view) == 8
    assert view.speakers == [1, 3]
    assert view.speakers_to_id is full.speakers_to_id
    # local indices map back to the right parent utterances
    for spk, utts in view.speakers_utterances.items():
        for local in utts:
            assert view[local]["speaker"] == spk
    # splits operate on local indices and stay disjoint
    train_utt, val_utt, test_utt = view.get_splits(
        val=True, val_utterances_per_speaker=1,
        test=True, test_speakers=1, test_utterances_per_speaker=1,
    )
    assert set(train_utt) | set(val_utt) | set(test_utt) <= set(range(8))
    assert not set(train_utt) & set(val_utt)
    utts, spks = view.get_random_utterances(2, 3, seed=0)
    assert len(utts) == 6 and set(spks) <= {1, 3}
    info = view.info(hours=False)
    assert info["num_utterances"] == 8 and info["num_speakers"] == 2
    durations = view.get_durations_per_speaker(hours=False)
    assert set(durations) == {1, 3} and all(v > 0 for v in durations.values())


def test_continuous_speed_perturbation():
    """sox-style continuous speed: rate ~ U(min, max), output length
    ~ len / rate, deterministic per (seed, epoch, position)."""
    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader, SpeedConfig

    ds = SyntheticSpeakerDataset(n_speakers=2, utterances_per_speaker=2,
                                 min_seconds=2.0, max_seconds=2.0)
    kw = dict(batch_size=4, shuffle=False, drop_last=False,
              chunk=ChunkConfig(enabled=False), prefetch=0, seed=9)
    loader = DataLoader(
        ds, speed=SpeedConfig(enabled=True, continuous=True,
                              rates=(0.9, 1.1), probability=1.0), **kw)
    plain = DataLoader(ds, **kw)
    b = next(iter(loader))
    p = next(iter(plain))
    ratios = p.lengths / b.lengths
    assert np.all((ratios > 0.88) & (ratios < 1.12))
    assert len(set(b.lengths.tolist())) > 1  # rates actually vary
    b2 = next(iter(DataLoader(
        ds, speed=SpeedConfig(enabled=True, continuous=True,
                              rates=(0.9, 1.1), probability=1.0), **kw)))
    np.testing.assert_array_equal(b.lengths, b2.lengths)  # deterministic


class _CountingDataset(SyntheticSpeakerDataset):
    """Counts __getitem__ decodes to observe cache behavior."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.decodes = 0

    def __getitem__(self, idx):
        self.decodes += 1
        return super().__getitem__(idx)


def test_waveform_cache_skips_decode_and_is_epoch_consistent():
    ds = _CountingDataset(n_speakers=4, utterances_per_speaker=6)
    loader = DataLoader(ds, batch_size=8, seed=3, prefetch=0,
                        cache_waveforms=True)
    loader.set_epoch(0)
    e0 = list(loader)
    first = ds.decodes
    assert first == len(e0) * 8
    loader.set_epoch(1)
    list(loader)
    assert ds.decodes == first  # epoch 2+ fully served from cache
    # cache-hit audio is bit-identical to the (quantized) miss-path audio
    loader.set_epoch(0)
    e0_again = list(loader)
    for a, b in zip(e0, e0_again):
        np.testing.assert_array_equal(a.waveform, b.waveform)
        np.testing.assert_array_equal(a.speaker_ids, b.speaker_ids)


def test_waveform_cache_budget_and_quantization_error():
    ds = SyntheticSpeakerDataset(n_speakers=3, utterances_per_speaker=4)
    plain = DataLoader(ds, batch_size=4, seed=5, prefetch=0)
    # budget 0: nothing inserted, but values still follow the quantized
    # (epoch-consistent) path and stay within one int16 step of the raw audio
    capped = DataLoader(ds, batch_size=4, seed=5, prefetch=0,
                        cache_waveforms=True, cache_budget_mb=0)
    plain.set_epoch(0), capped.set_epoch(0)
    for a, b in zip(plain, capped):
        assert np.max(np.abs(a.waveform - b.waveform)) <= 1.0 / 32768.0
    assert capped._cache_bytes == 0 and not capped._wave_cache
    full = DataLoader(ds, batch_size=4, seed=5, prefetch=0,
                      cache_waveforms=True)
    full.set_epoch(0)
    list(full)
    assert len(full._wave_cache) == len(ds)
    assert full._cache_bytes == sum(
        q.nbytes for q, _ in full._wave_cache.values()
    )


def test_waveform_cache_under_decode_workers(ds):
    """Cache + thread pool: same batches as the single-threaded cache run."""
    kw = dict(batch_size=8, seed=11, prefetch=0, cache_waveforms=True,
              chunk=ChunkConfig(max_length=1.5, enabled=True))
    a = DataLoader(ds, num_workers=0, **kw)
    b = DataLoader(ds, num_workers=4, **kw)
    for epoch in (0, 1):
        a.set_epoch(epoch), b.set_epoch(epoch)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x.waveform, y.waveform)
            np.testing.assert_array_equal(x.speaker_ids, y.speaker_ids)


def _noise_wav(tmp_path, name, freq=300.0, seconds=0.4):
    t = np.arange(int(seconds * 16000)) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    path = str(tmp_path / name)
    write_wav(path, wav[None], 16000)
    return path


def test_noise_mixing_snr_and_determinism(tmp_path, ds):
    from titanet_tpu.data import NoiseMixConfig

    paths = (_noise_wav(tmp_path, "n1.wav"), _noise_wav(tmp_path, "n2.wav", 700.0))
    # fixed SNR so the mixed power ratio is checkable; noise shorter than
    # the utterances exercises the loop-and-crop path
    noise = NoiseMixConfig(paths=paths, probability=1.0,
                           snr_min=10.0, snr_max=10.0, enabled=True)
    kw = dict(batch_size=4, seed=9, prefetch=0, shuffle=False,
              chunk=ChunkConfig(enabled=False))
    clean = DataLoader(ds, **kw)
    noisy = DataLoader(ds, noise=noise, **kw)
    clean.set_epoch(0), noisy.set_epoch(0)
    for a, b in zip(clean, noisy):
        added = b.waveform - a.waveform
        for i in range(len(a)):
            t = a.lengths[i]
            sig = np.mean(np.square(a.waveform[i, :t]))
            npow = np.mean(np.square(added[i, :t]))
            assert npow > 0
            snr_db = 10 * np.log10(sig / npow)
            np.testing.assert_allclose(snr_db, 10.0, atol=0.1)
    # deterministic per (seed, epoch)
    noisy.set_epoch(0)
    again = list(noisy)
    noisy.set_epoch(0)
    for x, y in zip(again, noisy):
        np.testing.assert_array_equal(x.waveform, y.waveform)


def test_cli_noise_mix_routing(tmp_path):
    from titanet_tpu.cli import _noise_mix_config
    from titanet_tpu.config import Config

    _noise_wav(tmp_path, "a.wav")
    cfg = Config.from_dict({
        "augmentation": {"enable": ["chunk", "noise"], "probability": 0.5,
                          "noise": {"source": "files",
                                    "corpora_path": str(tmp_path)}},
    })
    mix = _noise_mix_config(cfg)
    assert mix is not None and mix.enabled and len(mix.paths) == 1
    assert mix.probability == 0.5
    # synthetic source -> no host mixing
    cfg2 = Config.from_dict({"augmentation": {"enable": ["noise"]}})
    assert _noise_mix_config(cfg2) is None
    # files source with an empty dir and no download -> explicit error
    cfg3 = Config.from_dict({
        "augmentation": {"enable": ["noise"],
                          "noise": {"source": "files",
                                    "corpora_path": str(tmp_path / "empty")}},
    })
    with pytest.raises(FileNotFoundError):
        _noise_mix_config(cfg3)


def test_fetch_musan_file_url(tmp_path):
    import tarfile

    from titanet_tpu.data.acquire import fetch_musan

    # build a small musan.tar.gz: musan/noise/free-sound/noise-0001.wav
    src = tmp_path / "src" / "musan" / "noise" / "free-sound"
    src.mkdir(parents=True)
    _noise_wav(src, "noise-0001.wav")
    archive = tmp_path / "musan.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(tmp_path / "src" / "musan", arcname="musan")
    dest = str(tmp_path / "dest")
    out = fetch_musan(dest, source_url=f"file://{archive}", subset="noise")
    from pathlib import Path

    wavs = list(Path(out).rglob("*.wav"))
    assert len(wavs) == 1 and wavs[0].name == "noise-0001.wav"
    # idempotent: second call short-circuits on the existing wavs
    assert fetch_musan(dest, subset="noise") == out


def test_concat_dataset_full_protocol():
    """ConcatSpeakerDataset: namespaced disjoint speakers, index routing,
    splits, Subset/DataLoader composition — the whole stack on a union."""
    from titanet_tpu.data import ConcatSpeakerDataset

    a = SyntheticSpeakerDataset(n_speakers=3, utterances_per_speaker=4, seed=0)
    b = SyntheticSpeakerDataset(n_speakers=2, utterances_per_speaker=5, seed=1)
    cat = ConcatSpeakerDataset([a, b], names=["x", "y"])
    assert len(cat) == len(a) + len(b)
    assert cat.get_num_speakers() == 5
    assert all("/" in s for s in cat.speakers)
    assert sorted(cat.speakers_to_id.values()) == list(range(5))

    # index routing: the union's sample len(a)+1 IS b's sample 1, namespaced
    wav, sr, spk = cat.get_sample(len(a) + 1)
    wav_b, sr_b, spk_b = b.get_sample(1)
    np.testing.assert_array_equal(wav, wav_b)
    assert sr == sr_b and spk == f"y/{spk_b}"
    assert cat.get_path(len(a) + 1) == b.get_path(1)

    # speakers_utterances indices agree with get_sample's speaker
    for spk, utts in cat.speakers_utterances.items():
        assert cat.get_sample(utts[0])[2] == spk

    # full split + loader stack
    train_utt, val_utt, test_utt = cat.get_splits(
        val=True, val_utterances_per_speaker=1,
        test=True, test_speakers=2, test_utterances_per_speaker=1,
    )
    assert not set(train_utt) & set(val_utt)
    sub = Subset(cat, train_utt)
    assert sub.speakers_to_id is cat.speakers_to_id
    loader = DataLoader(sub, batch_size=4, chunk=ChunkConfig(enabled=True),
                        prefetch=0)
    batch = next(iter(loader))
    assert batch.waveform.shape[0] == 4
    assert all(0 <= int(s) < 5 for s in batch.speaker_ids)

    with pytest.raises(ValueError):
        ConcatSpeakerDataset([a, b], names=["x", "x"])
    with pytest.raises(ValueError):
        ConcatSpeakerDataset([])
    with pytest.raises(IndexError):
        cat.get_sample(len(cat))


def test_get_datasets_union(tmp_path):
    """get_datasets('voxceleb1+synthetic'): on-disk + procedural corpora
    combine; kwargs are filtered per backend; bad unions are rejected."""
    from titanet_tpu.data import get_datasets

    rng = np.random.default_rng(0)
    for spk in ("id001", "id002"):
        for i in range(4):
            p = tmp_path / "wav" / spk / "v0" / f"u{i}.wav"
            os.makedirs(p.parent, exist_ok=True)
            write_wav(str(p), rng.standard_normal(4000).astype(np.float32) * 0.1,
                      16000)

    train, val, test, n = get_datasets(
        str(tmp_path), name="voxceleb1+synthetic",
        val_utterances_per_speaker=1,
        test_speakers=2, test_utterances_per_speaker=1,
        n_speakers=3, utterances_per_speaker=4, seed=0,
    )
    assert n == 2 + 3
    names = {s.split("/")[0] for s in train.speakers}
    assert names == {"voxceleb1", "synthetic"}
    assert len(train) + len(val) + len(test) == 2 * 4 + 3 * 4

    with pytest.raises(ValueError):
        get_datasets(str(tmp_path), name="synthetic+synthetic")
    with pytest.raises(KeyError):
        get_datasets(str(tmp_path), name="synthetic+nosuch")
