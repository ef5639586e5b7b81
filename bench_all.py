"""Extended benchmark sweep: TitaNet S/M/L inference + training throughput.

Writes BENCHMARKS.md. (The driver contract lives in bench.py — one JSON
line for the headline metric; this script is the full table.)
"""

import time

import numpy as np


def chain_time(fn, v, x, iters=16):
    import jax
    import jax.numpy as jnp

    def chained(v, x0):
        def body(i, carry):
            xc, acc = carry
            e = fn(v, xc)
            return (xc + e.sum() * jnp.float32(1e-30), acc + e.sum())

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc

    c = jax.jit(chained)
    float(c(v, x))
    ts = []
    for t in range(3):
        xt = x + np.float32(t + 1)
        jax.block_until_ready(xt)
        t0 = time.perf_counter()
        float(c(v, xt))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import count_params, get_titanet, l2_normalize
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.state import train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = FrontendConfig.from_ms()
    rng = np.random.default_rng(0)
    rows = []

    B = 64  # fits TitaNet-L activations comfortably
    x = jnp.asarray(rng.standard_normal((B, 301, 80)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((B, 48000)) * 0.1, jnp.float32)
    lengths = jnp.full((B,), 48000, jnp.int32)
    speakers = jnp.asarray(rng.integers(0, 251, B), jnp.int32)

    for size in "sml":
        model = get_titanet(model_size=size, dtype=jnp.bfloat16)
        params_m = count_params(model) / 1e6
        v = jax.jit(model.init)(jax.random.key(0), x[:1])
        dt_inf = chain_time(
            lambda v, xx: l2_normalize(
                model.apply(v, xx.astype(jnp.bfloat16), train=False).astype(jnp.float32)
            ),
            v, x,
        )
        head = build_head("ce", 192, 251)
        opt = make_optimizer(start_lr=1e-3)
        state = create_train_state(
            jax.random.key(0), model, head, opt, jnp.zeros((2, 301, 80)), 251
        )
        kw = dict(model=model, head=head, optimizer=opt, frontend=cfg,
                  augment=(0.35, 1, 0.15, 1, 0.5))
        state, m = train_step(state, wav, lengths, speakers, **kw)
        float(m["loss"])
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = train_step(state, wav, lengths, speakers, **kw)
        float(m["loss"])
        dt_train = (time.perf_counter() - t0) / n
        rows.append(
            (size.upper(), model.n_mega_blocks, params_m,
             dt_inf * 1e3, B / dt_inf, dt_train * 1e3, B / dt_train)
        )
        print(rows[-1], flush=True)

    with open("BENCHMARKS.md", "w") as f:
        f.write(
            "# Benchmarks — TPU v5e, one chip\n\n"
            f"3-second utterances (301 mel frames), batch {B}, bf16 activations,\n"
            "rbg PRNG, device-side chained timing (see bench.py methodology).\n"
            "Training step = wav -> on-device frontend + SpecAugment -> fwd+bwd\n"
            "-> Adam, CE head, 251 classes.\n\n"
            "| model | mega blocks | params (M) | infer ms/batch | infer utt/s | "
            "train ms/step | train utt/s |\n|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| TitaNet-{r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} | "
                f"{r[4]:.0f} | {r[5]:.1f} | {r[6]:.0f} |\n"
            )
        f.write(
            "\nHeadline (bench.py, B=128): TitaNet-S mel->embedding "
            "~29-30k utt/s/chip — ~1900x the CPU PyTorch reference measured "
            "on this host (~16 utt/s).\n"
        )
    print("wrote BENCHMARKS.md")


if __name__ == "__main__":
    main()
