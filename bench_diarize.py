"""Diarization throughput: real-time factor (RTF) for the full pipeline.

Synthesizes a long multi-speaker conversation, then times
``titanet_tpu.train.diarize.diarize`` end to end — windowing, batched
device embedding (``SpeakerEmbedder``, bf16 ECAPA-512 by default),
NME-SC spectral clustering, merge — and reports audio-seconds processed
per wall-second (RTF; >1 = faster than real time). Wall-clock is the
right metric here (the pipeline interleaves host clustering with device
embedding); the relay's ~28 ms dispatch floor contributes <1% at this
audio length. One JSON line, same contract as the other benches.

    python bench_diarize.py            # ECAPA-512
    TITANET_BENCH_MODEL=xvector python bench_diarize.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

AUDIO_MINUTES = 10.0
SR = 16000
TURN_S = 3.0
N_SPEAKERS = 4


def synth_conversation(minutes: float, seed: int = 0) -> np.ndarray:
    """Alternating speaker turns of vowel-like tones (the embedder is
    untrained — RTF measures compute, not verification quality)."""
    rng = np.random.default_rng(seed)
    f0s = [110.0, 150.0, 200.0, 260.0]
    total = int(minutes * 60 * SR)
    out = np.zeros(total, np.float32)
    pos = 0
    spk = 0
    turn = int(TURN_S * SR)
    t = np.arange(turn) / SR
    while pos < total:
        n = min(turn, total - pos)
        f0 = f0s[spk % N_SPEAKERS] * (1.0 + 0.02 * rng.standard_normal())
        tone = 0.2 * np.sin(2 * np.pi * f0 * t[:n])
        tone += 0.1 * np.sin(2 * np.pi * 3 * f0 * t[:n])
        out[pos:pos + n] = tone + 0.01 * rng.standard_normal(n)
        pos += n
        spk += 1
    return out


def main():
    import jax
    import jax.numpy as jnp

    from titanet_tpu.train.diarize import diarize
    from titanet_tpu.train.extractor import SpeakerEmbedder

    bench_model = os.environ.get("TITANET_BENCH_MODEL", "ecapa")
    if bench_model == "ecapa":
        from titanet_tpu.models import get_ecapa

        model = get_ecapa(channels=512, dtype=jnp.bfloat16)
    elif bench_model == "xvector":
        from titanet_tpu.models import get_xvector

        model = get_xvector(dtype=jnp.bfloat16)
    else:
        from titanet_tpu.models import get_titanet

        model = get_titanet(model_size="s", n_mega_blocks=17,
                            dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, 151, 80), jnp.bfloat16)
    )
    embedder = SpeakerEmbedder(
        model, variables["params"], variables.get("batch_stats", {}),
        batch_size=128,
    )
    wav = synth_conversation(AUDIO_MINUTES)
    # warmup: compile the bucketed embed executables on a short prefix
    diarize(wav[: int(30 * SR)], SR, embedder, n_speakers=N_SPEAKERS)
    t0 = time.perf_counter()
    segments = diarize(wav, SR, embedder, n_speakers=N_SPEAKERS)
    dt = time.perf_counter() - t0
    audio_s = len(wav) / SR
    print(json.dumps({
        "metric": f"diarization RTF ({bench_model}, window 1.5s hop 0.75s)",
        "value": round(audio_s / dt, 1),
        "unit": "audio-seconds per wall-second (x real time)",
        "audio_minutes": AUDIO_MINUTES,
        "wall_seconds": round(dt, 2),
        "segments": len(segments),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
