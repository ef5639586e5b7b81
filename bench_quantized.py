"""Int8 serving benchmark: quantized TitaNet-S mel->embedding vs bf16 flax.

On v5e the MXU's int8 path doubles the bf16 peak; the bf16 model already
sits near the MXU roofline (BENCHMARKS.md), so int8 is the remaining
headroom. Also reports the embedding cosine similarity between the two
paths on the same inputs. Chained-serial timing, single readback
(bench.py methodology). One JSON line per (path, batch).
"""

import json
import time

import numpy as np

T_SECONDS = 3.0
N_MELS = 80
FRAMES = int(T_SECONDS * 16000) // 160 + 1  # 301
ITERS = 64


def main():
    import jax
    import jax.numpy as jnp

    from titanet_tpu.models import (
        get_titanet,
        l2_normalize,
        quantize_titanet,
        titanet_apply_quantized,
    )

    rng = np.random.default_rng(0)
    # fixed ~25 ms dispatch+readback floor per synced call (bench_util)
    from bench_util import measure_rtt_floor

    floor = measure_rtt_floor()
    print(json.dumps({"rtt_floor_ms": round(floor * 1e3, 2), "iters": ITERS}))

    model_bf16 = get_titanet(model_size="s", n_mega_blocks=17, dtype=jnp.bfloat16)
    model_f32 = get_titanet(model_size="s", n_mega_blocks=17)
    mel0 = jnp.asarray(rng.standard_normal((1, FRAMES, N_MELS)), jnp.float32)
    variables = jax.jit(model_f32.init)(jax.random.key(0), mel0)
    qtree = jax.jit(lambda v: quantize_titanet(model_f32, v))(variables)

    def embed_bf16(v, x):
        return l2_normalize(
            model_bf16.apply(v, x.astype(jnp.bfloat16), train=False).astype(
                jnp.float32
            )
        )

    def embed_int8(q, x):
        return l2_normalize(titanet_apply_quantized(q, x))

    # embedding agreement (single readback, B=32)
    xq = jnp.asarray(rng.standard_normal((32, FRAMES, N_MELS)), jnp.float32)
    e_b = jax.jit(embed_bf16)(variables, xq)
    e_q = jax.jit(embed_int8)(qtree, xq)
    cos = np.sum(np.asarray(e_b) * np.asarray(e_q), axis=-1)
    print(json.dumps({
        "metric": "int8-vs-bf16 embedding cosine",
        "min": round(float(cos.min()), 5),
        "mean": round(float(cos.mean()), 5),
    }))

    # full serving stack: wav -> frontend -> encoder -> unit-norm embedding
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    fe_parity = FrontendConfig.from_ms()
    fe_fast = FrontendConfig.from_ms(precision="default", use_pallas_fused=True)

    def serve_bf16(v, wav):
        mel, _ = log_mel_spectrogram(wav, fe_parity)
        return embed_bf16(v, mel)

    def serve_bf16_fast(v, wav):
        mel, _ = log_mel_spectrogram(wav, fe_fast)
        return embed_bf16(v, mel)

    def serve_int8(q, wav):
        mel, _ = log_mel_spectrogram(wav, fe_fast)
        return embed_int8(q, mel)

    cases = []
    for B in (128, 256):
        x0 = jnp.asarray(rng.standard_normal((B, FRAMES, N_MELS)), jnp.float32)
        w0 = jnp.asarray(
            rng.standard_normal((B, int(T_SECONDS * 16000))) * 0.1, jnp.float32
        )
        cases += [
            (f"mel->emb bf16_flax B={B}", embed_bf16, variables, x0, B),
            (f"mel->emb int8_quantized B={B}", embed_int8, qtree, x0, B),
            (f"wav->emb bf16+parity-frontend B={B}", serve_bf16, variables, w0, B),
            (f"wav->emb bf16+fused-frontend B={B}", serve_bf16_fast, variables, w0, B),
            (f"wav->emb int8+fused-frontend B={B}", serve_int8, qtree, w0, B),
        ]
    for name, fn, arg, x0, B in cases:
        def chained(a, xin, fn=fn):
            def body(i, carry):
                xc, acc = carry
                e = fn(a, xc)
                xc = xc + e.sum() * jnp.float32(1e-30)
                return (xc, acc + e.sum())

            _, acc = jax.lax.fori_loop(0, ITERS, body, (xin, jnp.float32(0.0)))
            return acc

        chain = jax.jit(chained)
        float(chain(arg, x0))  # compile + warm
        times = []
        for trial in range(3):
            xt = x0 + np.float32(trial + 1)
            jax.block_until_ready(xt)
            t0 = time.perf_counter()
            float(chain(arg, xt))
            times.append((time.perf_counter() - t0 - floor) / ITERS)
        ms = float(np.median(times)) * 1e3
        print(json.dumps({
            "metric": f"TitaNet-S {name}",
            "value": round(ms, 3),
            "unit": "ms/batch",
            "utt_per_s": round(B / (ms / 1e3), 0),
            "batch": B,
        }))


if __name__ == "__main__":
    main()
