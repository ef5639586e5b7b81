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


def main():
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(["make", "-C", os.path.join(repo, "native"), "-s"], check=True)
    from titanet_tpu.data import ChunkConfig, DataLoader, LibriSpeechDataset

    with tempfile.TemporaryDirectory() as root:
        build_corpus(root)
        ds = LibriSpeechDataset(root)
        n_utt = len(ds)
        for workers in (0, 2, 4):
            loader = DataLoader(
                ds, batch_size=16, chunk=ChunkConfig(enabled=True),
                transport_dtype="int16", seed=0, num_workers=workers,
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
                "decode_workers": workers,
                "value": round(n_utt / dt, 1),
                "unit": "utt/s (whole process; divide by active cores for per-core)",
                "utterance_seconds": SECONDS,
                "corpus_utterances": n_utt,
            }))


if __name__ == "__main__":
    main()
