"""Frontend-path shootout: wav -> normalized log-mel, all four implementations.

Paths (all parity-tested against torch.stft/torchaudio, tests/test_frontend.py
and tests/test_pallas_melspec.py):
  xla_strided  — frame (strided-slice reshapes) -> windowed-DFT matmul -> mel
  xla_conv     — framing+window+DFT as ONE strided convolution (implicit GEMM)
  pallas       — XLA framing + fused Pallas DFT->power->mel->dB->norm kernel
  pallas_fused — everything in one Pallas kernel; frames/spectrum never in HBM

Measured at both precisions ('highest' = torchaudio-parity f32 passes,
'default' = bf16 MXU passes). Chained-serial timing, single readback
(see bench.py methodology notes). Prints one JSON line per (path, precision)
plus a summary winner line.
"""

import json
import time

import numpy as np

B = 128
T_SECONDS = 3.0
SR = 16000
N = int(T_SECONDS * SR)
ITERS = 128

from bench_util import measure_rtt_floor  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from titanet_tpu.ops.pallas.melspec import (
        log_mel_spectrogram_pallas,
        log_mel_spectrogram_pallas_fused,
    )

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32)
    frames = 1 + N // 160
    floor = measure_rtt_floor()
    print(json.dumps({"rtt_floor_ms": round(floor * 1e3, 2), "iters": ITERS}))

    def make_paths(precision):
        strided = FrontendConfig.from_ms(use_conv_dft=False, precision=precision)
        conv = FrontendConfig.from_ms(use_conv_dft=True, precision=precision)
        return {
            "xla_strided": lambda x: log_mel_spectrogram(x, strided)[0],
            "xla_conv": lambda x: log_mel_spectrogram(x, conv)[0],
            "pallas": lambda x: log_mel_spectrogram_pallas(x, conv)[0],
            "pallas_fused": lambda x: log_mel_spectrogram_pallas_fused(x, conv)[0],
        }

    results = {}
    for precision in ("highest", "default"):
        for name, fn in make_paths(precision).items():
            def chained(x0, fn=fn):
                def body(i, carry):
                    xc, acc = carry
                    mel = fn(xc)
                    xc = xc + mel.sum() * jnp.float32(1e-30)
                    return (xc, acc + mel.sum())

                _, acc = jax.lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0.0)))
                return acc

            chain = jax.jit(chained)
            float(chain(wav))  # compile + warm
            times = []
            for trial in range(3):
                xt = wav + np.float32((trial + 1) * 1e-3)
                jax.block_until_ready(xt)
                t0 = time.perf_counter()
                float(chain(xt))
                times.append((time.perf_counter() - t0 - floor) / ITERS)
            ms = float(np.median(times)) * 1e3
            results[(name, precision)] = ms
            print(json.dumps({
                "metric": f"wav->mel {name}",
                "precision": precision,
                "value": round(ms, 3),
                "unit": "ms/batch",
                "utt_per_s": round(B / (ms / 1e3), 0),
                "batch": B,
                "frames": frames,
            }))

    for precision in ("highest", "default"):
        sub = {k[0]: v for k, v in results.items() if k[1] == precision}
        best_xla = min(sub["xla_strided"], sub["xla_conv"])
        print(json.dumps({
            "summary": precision,
            "best_xla_ms": round(best_xla, 3),
            "pallas_fused_ms": round(sub["pallas_fused"], 3),
            "pallas_fused_vs_best_xla": round(best_xla / sub["pallas_fused"], 2),
        }))


if __name__ == "__main__":
    main()
