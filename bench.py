"""Headline benchmark: TitaNet-S mel->embedding throughput (utt/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

The baseline is the CPU PyTorch reference (Wadaboa/titanet) measured here on
the same machine with the identical architecture and batch — the reference
publishes no numbers (BASELINE.md), so the comparison row is produced live.
Target (BASELINE.json): >= 10x the CPU reference with < 1e-3 cosine drift.
"""

import json
import os
import sys
import time

import numpy as np

B = 128  # TPU batch (bf16 B=128 sits at peak utilization for TitaNet-S)
B_CPU = 32  # reference CPU batch (throughput there is batch-independent)
T_SECONDS = 3.0
N_MELS = 80
SR = 16000
FRAMES = int(T_SECONDS * SR) // 160 + 1  # 301
DTYPE = "bfloat16"  # embedding cosine drift vs f32 measured at 7.2e-6
#                     (PARITY.md r3), well inside the 1e-3 parity budget
#                     (BASELINE.md); params stay f32


def bench_tpu(mel: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from titanet_tpu.models import get_titanet, l2_normalize

    import os

    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else None
    # TITANET_BENCH_SCAN=1 measures the scan_blocks encoder layout;
    # TITANET_BENCH_MODEL=ecapa measures the ECAPA-TDNN family (C=512)
    bench_model = os.environ.get("TITANET_BENCH_MODEL", "")
    if bench_model == "ecapa":
        from titanet_tpu.models import get_ecapa

        model = get_ecapa(channels=512, dtype=dtype)
    elif bench_model == "xvector":
        from titanet_tpu.models import get_xvector

        model = get_xvector(dtype=dtype)
    elif bench_model == "resnet":
        from titanet_tpu.models import get_resnet

        model = get_resnet(dtype=dtype)
    elif bench_model == "conformer":
        from titanet_tpu.models import get_conformer

        model = get_conformer(dtype=dtype)
    else:
        model = get_titanet(model_size="s", n_mega_blocks=17, dtype=dtype,
                            scan_blocks=os.environ.get("TITANET_BENCH_SCAN", "") == "1")
    x = jnp.asarray(mel, jnp.bfloat16 if dtype else jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    def embed(v, x):
        return l2_normalize(model.apply(v, x, train=False).astype(jnp.float32))

    # Timing methodology for the remote-TPU relay (hard-won; see README):
    # - duplicate (executable, args) requests are served from a cache ->
    #   distinct inputs required;
    # - loops over *perturbed* inputs get hoisted when the perturbation
    #   rounds away (bf16 ulp) -> >peak-FLOPs readings;
    # - block_until_ready returns before completion; only a value readback
    #   synchronizes, and a synced call has a fixed ~25 ms dispatch+RTT
    #   floor regardless of device work (measured with a trivial jitted op).
    # So: ONE jitted chain of `iters` model calls where each iteration's
    # input data-depends on the previous output (structurally serial,
    # unhoistable), a single scalar readback, and the measured RTT floor
    # subtracted from each chain's wall time.
    iters = 64

    from bench_util import measure_rtt_floor

    floor = measure_rtt_floor()

    def chained(v, x0):
        def body(i, carry):
            xc, acc = carry
            e = embed(v, xc.astype(x.dtype))
            # data dependence on e: cannot be hoisted or parallelized
            xc = xc + e.sum() * jnp.float32(1e-30)
            return (xc, acc + e.sum())

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc

    # Serving-default compiler options (measured win; train/state.py
    # infer_xla_options docstring + BENCHMARKS.md inference sweep).
    from titanet_tpu.train.state import infer_xla_options

    chain = jax.jit(chained, compiler_options=infer_xla_options() or None)
    x0 = x.astype(jnp.float32)
    float(chain(variables, x0))  # compile + warm (readback syncs)
    times = []
    for trial in range(3):
        xt = x0 + np.float32(trial + 1)
        jax.block_until_ready(xt)
        t0 = time.perf_counter()
        float(chain(variables, xt))
        times.append((time.perf_counter() - t0 - floor) / iters)
    dt = float(np.median(times))
    return B / dt


def bench_cpu_reference(mel: np.ndarray, max_seconds: float = 60.0) -> float:
    """Measure the reference PyTorch TitaNet-S on CPU (same arch/batch)."""
    sys.path.insert(0, "/root/reference/src")
    import torch

    import models as ref_models

    mel = mel[:B_CPU]
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
    return B_CPU / dt


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
                "metric": {"ecapa": "ECAPA-512", "xvector": "x-vector", "resnet": "ResNet34", "conformer": "MFA-Conformer"}.get(os.environ.get("TITANET_BENCH_MODEL", ""), "TitaNet-S") + " mel->embedding throughput",
                "value": round(tpu, 1),
                "unit": "utt/s/chip",
                "vs_baseline": round(vs, 1) if vs is not None else None,
                "baseline_cpu_reference_utt_s": round(cpu, 2) if cpu else None,
                "batch": B,
                "frames": FRAMES,
                "dtype": DTYPE,
            }
        )
    )


if __name__ == "__main__":
    main()
