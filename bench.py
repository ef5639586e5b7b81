"""Headline benchmark: TitaNet-S mel->embedding throughput (utt/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

The baseline is the CPU PyTorch reference (Wadaboa/titanet) measured here on
the same machine with the identical architecture and batch — the reference
publishes no numbers (BASELINE.md), so the comparison row is produced live.
Target (BASELINE.json): >= 10x the CPU reference with < 1e-3 cosine drift.
"""

import json
import sys
import time

import numpy as np

B = 32
T_SECONDS = 3.0
N_MELS = 80
SR = 16000
FRAMES = int(T_SECONDS * SR) // 160 + 1  # 301


def bench_tpu(mel: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from titanet_tpu.models import get_titanet, l2_normalize

    model = get_titanet(model_size="s", n_mega_blocks=17)
    x = jnp.asarray(mel)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    iters = 50

    @jax.jit
    def embed_loop(v, x):
        # Device-side loop, iteration-dependent input. NOTE: the remote-TPU
        # relay memoizes duplicate (executable, args) requests, so every
        # timed call below uses a DISTINCT x; the returned checksum scales
        # linearly with iters (verified), i.e. the loop really computes.
        def body(i, acc):
            e = l2_normalize(model.apply(v, x + i * 1e-6, train=False))
            return acc + e.sum()

        return jax.lax.fori_loop(0, iters, body, 0.0)

    embed_loop(variables, x).block_until_ready()  # compile
    times = []
    for trial in range(3):
        xt = x + np.float32(trial + 1)  # distinct input per timed call
        xt.block_until_ready()
        t0 = time.perf_counter()
        embed_loop(variables, xt).block_until_ready()
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    return B / dt


def bench_cpu_reference(mel: np.ndarray, max_seconds: float = 60.0) -> float:
    """Measure the reference PyTorch TitaNet-S on CPU (same arch/batch)."""
    sys.path.insert(0, "/root/reference/src")
    import torch

    import models as ref_models

    torch.manual_seed(0)
    model = ref_models.TitaNet(
        n_mels=N_MELS,
        n_mega_blocks=17,
        n_sub_blocks=3,
        encoder_hidden_size=256,
        encoder_output_size=1536,
        embedding_size=192,
        mega_block_kernel_size=3,
        dropout=0.0,
    )
    model.eval()
    x = torch.from_numpy(mel.transpose(0, 2, 1).copy())  # [B, M, T]
    with torch.no_grad():
        t0 = time.perf_counter()
        model(x)  # warmup
        warm = time.perf_counter() - t0
        iters = max(1, min(10, int(max_seconds / max(warm, 1e-3))))
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return B / dt


def main():
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((B, FRAMES, N_MELS)).astype(np.float32)
    tpu = bench_tpu(mel)
    try:
        cpu = bench_cpu_reference(mel)
        vs = tpu / cpu
    except Exception:
        cpu, vs = None, None
    print(
        json.dumps(
            {
                "metric": "TitaNet-S mel->embedding throughput",
                "value": round(tpu, 1),
                "unit": "utt/s/chip",
                "vs_baseline": round(vs, 1) if vs is not None else None,
                "baseline_cpu_reference_utt_s": round(cpu, 2) if cpu else None,
                "batch": B,
                "frames": FRAMES,
                "dtype": "float32",
            }
        )
    )


if __name__ == "__main__":
    main()
