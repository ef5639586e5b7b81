"""End-to-end serving benchmark: audio FILES in -> embeddings out.

VERDICT r3 item 4: the headline bench starts from in-memory mel tensors;
the user-visible serving number includes FLAC decode (native/audioio.cpp
via ctypes), multi-channel downmix, geometric length bucketing, the
on-device fused frontend, and the TitaNet-S bf16 embed — i.e. exactly
what `SpeakerEmbedder.embed` + `read_audio` do for a request stream.
(The reference's equivalent path scores verification pairs one file at a
time at B=1, src/learn.py:429-459.)

Protocol: a LibriSpeech-layout corpus of real FLAC files at mixed
lengths (2-6 s), served in request batches of ``BATCH`` files.

- cold = first pass over all files: includes model compile for every
  length bucket, first-touch file IO, and decode.
- hot  = repeat passes with the OS page cache warm and executables
  compiled; decode still runs per request (serving decodes every
  request; only compiles/file-cache are warm).

Per-batch latency is wall time for decode+bucket+embed+readback of one
request batch through the remote-TPU relay; the relay's fixed
dispatch+readback floor is reported alongside (it is part of user
latency here, so it is NOT subtracted from p50/p99; the floor-free
throughput row shows chip-side capacity).

Prints ONE JSON line.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_FILES = 256
BATCH = 32
SR = 16000


def build_corpus(root):
    from tests.flac_fixture import encode_flac

    rng = np.random.default_rng(0)
    paths = []
    base = os.path.join(root, "LibriSpeech", "serve")
    for i in range(N_FILES):
        spk = 100 + i % 16
        d = os.path.join(base, str(spk), "1")
        os.makedirs(d, exist_ok=True)
        seconds = float(rng.uniform(2.0, 6.0))
        n = int(seconds * SR)
        t = np.arange(n) / SR
        tone = np.sin(2 * np.pi * (90 + spk) * t) + 0.3 * np.sin(
            2 * np.pi * (180 + 2 * spk) * t
        )
        pcm = (tone * 8000 + rng.standard_normal(n) * 120).astype(np.int64)
        path = os.path.join(d, f"{spk}-1-{i:04d}.flac")
        with open(path, "wb") as f:
            f.write(encode_flac(pcm[None, :], sample_rate=SR, mode="fixed2"))
        paths.append(path)
    return paths


def serve_pass(embedder, paths):
    """One pass over the request stream in batches; returns per-batch wall
    latencies [s] and the embedding count."""
    from titanet_tpu.data.audio_io import read_audio

    lat, n_emb = [], 0
    for i in range(0, len(paths), BATCH):
        group = paths[i:i + BATCH]
        t0 = time.perf_counter()
        wavs = []
        for p in group:
            wav, sr = read_audio(p)
            wav = np.asarray(wav, np.float32)
            if wav.ndim == 2:
                wav = wav.mean(axis=0)
            wavs.append(wav.reshape(-1))
        emb = embedder.embed(wavs)  # numpy out => device readback synced
        lat.append(time.perf_counter() - t0)
        n_emb += emb.shape[0]
    return lat, n_emb


def main():
    import jax
    import jax.numpy as jnp

    from bench_util import measure_rtt_floor
    from titanet_tpu.models import get_titanet
    from titanet_tpu.train.extractor import SpeakerEmbedder

    os.environ.setdefault("TITANET_BENCH", "1")

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    paths = build_corpus(tmp)

    model = get_titanet(model_size="s", n_mega_blocks=17, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, 301, 80), jnp.bfloat16)
    )
    embedder = SpeakerEmbedder(
        model=model,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        batch_size=BATCH,
    )

    t0 = time.perf_counter()
    cold_lat, n = serve_pass(embedder, paths)
    cold_s = time.perf_counter() - t0

    hot_lat = []
    t0 = time.perf_counter()
    for _ in range(3):
        lat, _ = serve_pass(embedder, paths)
        hot_lat += lat
    hot_s = (time.perf_counter() - t0) / 3

    floor = measure_rtt_floor()
    hot = np.asarray(hot_lat)
    n_batches_per_pass = len(hot_lat) // 3
    hot_utt_s = N_FILES / hot_s
    hot_utt_s_nofloor = N_FILES / max(hot_s - floor * n_batches_per_pass, 1e-9)
    print(json.dumps({
        "metric": "serving files->embeddings throughput (hot)",
        "value": round(hot_utt_s, 1),
        "unit": "utt/s/chip",
        "n_files": N_FILES,
        "request_batch": BATCH,
        "cold_pass_s": round(cold_s, 2),
        "cold_utt_s": round(n / cold_s, 1),
        "hot_utt_s_relay_floor_subtracted": round(hot_utt_s_nofloor, 1),
        "batch_latency_p50_ms": round(float(np.percentile(hot, 50)) * 1e3, 1),
        "batch_latency_p99_ms": round(float(np.percentile(hot, 99)) * 1e3, 1),
        "relay_floor_ms": round(floor * 1e3, 1),
        "dtype": "bfloat16",
    }))


if __name__ == "__main__":
    main()
