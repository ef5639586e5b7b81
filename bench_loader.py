"""Host-side loader throughput: FLAC decode -> chunk -> collate (utt/s).

SURVEY.md §7 hard part 7: the host must keep the chips fed — at the
measured 29.6 ms/step (B=128) the train step consumes ~4.3k utt/s/chip,
so host decode throughput bounds how many chips one host can drive.
Builds a LibriSpeech-layout corpus of REAL 3 s FLAC files (the fixture
encoder from tests/), then times `DataLoader` epochs (native C++ decoder,
chunking, padded collation, optional parallel decode workers). Pure host
benchmark — no TPU involved. One JSON line per worker count.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SPEAKERS = 8
UTT_PER_SPK = 8
SECONDS = 3.0


def build_corpus(root):
    from tests.flac_fixture import encode_flac

    base = os.path.join(root, "LibriSpeech", "train-clean-100")
    rng = np.random.default_rng(0)
    n = int(SECONDS * 16000)
    for spk in range(19, 19 + N_SPEAKERS):
        d = os.path.join(base, str(spk), str(100 + spk))
        os.makedirs(d)
        for utt in range(UTT_PER_SPK):
            tone = np.sin(2 * np.pi * (100 + spk) * np.arange(n) / 16000)
            pcm = (tone * 8000 + rng.standard_normal(n) * 100).astype(np.int64)
            blob = encode_flac(pcm[None, :], sample_rate=16000, mode="fixed2")
            with open(os.path.join(d, f"{spk}-{100+spk}-{utt:04d}.flac"), "wb") as f:
                f.write(blob)


def build_rirs(root, n=4):
    """Synthetic room impulse responses (exponentially-decaying noise) so
    the reverb augmentation path runs without the OpenSLR-28 corpus."""
    import wave

    rng = np.random.default_rng(7)
    paths = []
    for i in range(n):
        t = np.arange(int(0.25 * 16000))
        rir = rng.standard_normal(t.size) * np.exp(-t / (0.03 * 16000))
        pcm = (rir / np.max(np.abs(rir)) * 20000).astype(np.int16)
        path = os.path.join(root, f"rir_{i}.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        paths.append(path)
    return tuple(paths)


def main():
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(["make", "-C", os.path.join(repo, "native"), "-s"], check=True)
    from titanet_tpu.data import (
        ChunkConfig,
        DataLoader,
        LibriSpeechDataset,
        ReverbConfig,
        SpeedConfig,
    )

    with tempfile.TemporaryDirectory() as root:
        build_corpus(root)
        rirs = build_rirs(root)
        ds = LibriSpeechDataset(root)
        n_utt = len(ds)
        # (tag, extra loader kwargs) — 'augmented' is the real training
        # configuration: chunk + speed perturb + convolution reverb, both
        # per-example on the host (reference src/transforms.py:78-108,
        # 236-298)
        aug = dict(
            speed=SpeedConfig(rates=(0.95, 1.0, 1.05), probability=0.5,
                              enabled=True, continuous=True),
            reverb=ReverbConfig(rir_paths=rirs, probability=0.5,
                                enabled=True),
        )
        configs = [
            ("decode+chunk", {}),
            ("decode+chunk+speed+reverb", dict(aug)),
            # generic.cache_waveforms: epochs >= 2 serve decoded audio from
            # the int16 cache — this row measures the steady-state epoch
            # (the warm-up epoch below fills the cache)
            ("cached+chunk", dict(cache_waveforms=True)),
            ("cached+chunk+speed+reverb", dict(aug, cache_waveforms=True)),
        ]
        for tag, extra in configs:
            for workers in (0, 2, 4):
                loader = DataLoader(
                    ds, batch_size=16, chunk=ChunkConfig(enabled=True),
                    transport_dtype="int16", seed=0, num_workers=workers,
                    **extra,
                )
                # warm one epoch (page cache, worker spin-up)
                for _ in loader:
                    pass
                epochs = 5
                t0 = time.perf_counter()
                for _ in range(epochs):
                    for batch in loader:
                        pass
                dt = (time.perf_counter() - t0) / epochs
                print(json.dumps({
                    "metric": "loader FLAC->batch throughput",
                    "pipeline": tag,
                    "decode_workers": workers,
                    "value": round(n_utt / dt, 1),
                    "unit": "utt/s (whole process; divide by active cores for per-core)",
                    "utterance_seconds": SECONDS,
                    "corpus_utterances": n_utt,
                }))


if __name__ == "__main__":
    main()
