"""Extended benchmark sweep: TitaNet S/M/L inference + training throughput.

Writes BENCHMARKS.md. (The driver contract lives in bench.py — one JSON
line for the headline metric; this script is the full table. Frontend and
serving-stack tables quote bench_frontend.py / bench_quantized.py runs.)
"""

import time

import numpy as np


from bench_util import measure_rtt_floor


def chain_time(fn, v, x, floor, iters=64):
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
        ts.append((time.perf_counter() - t0 - floor) / iters)
    return float(np.median(ts))


EXTRA_SECTIONS = """
(The sections below quote bench_frontend.py / bench_quantized.py /
bench_loader.py / profile_train.py runs from 2026-08-17 (round 3); re-run
those scripts for current numbers.)

Train-step budget at B=128 (profile_train.py trace, 25.8 ms total with the
parity f32 frontend; 24.9 ms with the EER-validated bf16 frontend):
convolution fusions 12.6 ms (fwd GEMMs ~80% MFU; bwd grouped-conv
gradients at their bandwidth envelope — a shifted-adds custom-VJP swap
measured WORSE, 32.6 ms/step), elementwise loop fusions 6.4 ms (BN
apply/grad, dropout masks, SpecAugment interp, Adam), MSA param-prefetch
copies 2.8 ms (~2000 tiny f32[256] VMEM stagings across fwd+bwd
consumers; invariant to donation and optimizer choice — no user-side
lever found), fused pooling kernels 1.2 ms (custom-call), PRNG bits
1.1 ms, dropout-mask DMA 1.0 ms.

Round-3 campaign (29.6 -> 24.9 ms/step, 4.3k -> 5.1k utt/s): deferred
flat BatchNorm EMA (-~1 ms of 1 KB DMA-queue copies), folded bf16 BN
apply, strided-GEMM DFT default, uniform-length fast path, fused
attentive-pooling kernel with recompute VJP (-~1.5 ms), epilog-BN fold
into that kernel (-~0.9 ms), bf16 frontend (-1 ms, quality-validated:
docs/eer_bench bench6 lands inside the CE parity band). Roofline: the
remaining step moves ~17 GB of HBM traffic per step; at 819 GB/s that is
a ~20.5 ms floor for this fusion structure — 24.9 ms measured = ~82% of
the bandwidth bound, with the gap mostly the MSA copies and sub-50%-MFU
backward GEMMs. Recorded negative results (all measured in the FULL
step): depthwise fwd as shifted adds (-24%), depthwise bwd custom VJP
(32.6 ms), optax.flatten (+4.5 ms), shared bit-plane dropout pool
(38.4 ms). B=128 is the sweet spot — B=256/512 drop to 3.2k/2.6k utt/s.

## Methodology (remote-TPU relay; hard-won)

Chained device-side timing: one jitted chain of N calls where every
iteration's input data-depends on the previous output (structurally serial
— can't be hoisted or cache-served), ONE scalar readback at the end. A
synced call has a fixed **~25-29 ms dispatch+readback floor** regardless of
device work (measured each run with a trivial jitted op and SUBTRACTED from
every chain's wall time — at 32 iters the floor alone would inflate
per-batch numbers by ~0.8 ms; round-1 numbers carried that inflation).

## Frontend: wav -> normalized log-mel (B=128, 3 s, bench_frontend.py)

| path | 'highest' (torchaudio parity) | 'default' (serving) |
|---|---|---|
| XLA strided-frame + GEMM DFT | **1.02 ms** | 0.37 ms |
| XLA conv-DFT (implicit GEMM) | 1.18 ms | 1.02 ms |
| Pallas DFT..norm (XLA framing) | 1.69 ms | 0.84 ms |
| Pallas fully-fused (framing in-kernel) | 1.42 ms | **0.26 ms** |

At serving precision the fully-fused kernel is the fastest wav->mel path on
the chip (**1.3-1.4x the best XLA pipeline** across runs, ~460-490k
utt/s): framing is
phase-decomposed into lane-aligned MXU matmuls against a resident basis, so
the frames tensor (3.2x the waveform bytes) and the complex spectrum never
touch HBM, and bf16 operands run the MXU at its full rate. At 'highest'
precision the multi-pass f32 matmuls dominate and the kernel's 1.19x
pad-FLOPs lose to XLA's single ideal-K GEMM — the parity path stays XLA.
Roofline: fused-kernel HBM traffic is ~1 KB/frame (wav in, mel out) = 45 us
/batch floor; the measured 0.26 ms is MXU-bound (DFT ~32 GFLOP/batch incl.
1.19x phase padding).

NEW in round 3: 'default' precision is quality-VALIDATED for training —
the bench6 EER band (bf16 frontend) lands inside the CE parity-frontend
band on the hard corpus (docs/eer_bench/RESULTS.md). Enable with
`audio.frontend_precision: default`.

## Serving stacks: TitaNet-S end-to-end (bench_quantized.py, round 3)

| stack | B=128 | utt/s/chip |
|---|---|---|
| mel->emb, bf16 flax encoder | 2.44 ms | 52.4k |
| wav->emb, parity frontend + bf16 encoder | 3.37 ms | 38.0k |
| wav->emb, fused frontend + bf16 encoder | **2.77 ms** | **46.1k** |
| wav->emb, fused frontend + int8 encoder | 31.7 ms | 4.0k |

(Round 2 for comparison: 3.13 / 4.62 / 3.44 ms — the fused pooling kernel
with the epilog-BN fold lifted every bf16 stack ~20%.) Single-utterance
(B=1) wav->emb device latency with the fused frontend: **0.110 ms**
(chained, round 3; a remote client additionally pays the relay's ~25 ms
RTT — on-pod serving sees the device number).

## Int8 quantization: quality yes, speed no (on this stack)

Post-training int8 (per-channel weights with folded BN, dynamic per-row
activations, int8->int32 MXU accumulate; `titanet_tpu/models/quantized.py`)
keeps embedding cosine vs bf16 at **>= 0.9997** — but measured raw int8
matmul throughput here is BELOW bf16 (119 TOP/s via XLA, 90 via a Pallas
kernel, vs 207 TFLOP/s bf16 at the same shapes), so the int8 encoder is
~10x slower end-to-end. The int8 path ships as a tested capability (4x
weight compression for memory-constrained serving); the speed path is bf16.

## Host-side loader (bench_loader.py)

FLAC decode (first-party C++ decoder) -> chunk -> padded collation on this
1-core host: **~278 utt/s** (single-core process) for 3 s utterances; with
the REAL training augmentation chain (chunk + continuous speed perturb +
convolution reverb) throughput drops only ~10% (~250 utt/s) — decode
dominates, which is why speed/reverb stay host-side (device-side batched
equivalents exist in `ops/augment.py` for hosts that do saturate).
Production math: the train step consumes ~5.1k utt/s/chip, so feeding one
chip from raw FLAC needs ~20 host cores — or pre-decoded int16 storage
(`transport_dtype="int16"` halves host->device bytes), per-host sharded
loaders (multi-host wiring in `cli.py`), and the on-device frontend doing
the rest (the reference instead re-ran STFT+mel per example per epoch on
the host).

## Pallas scoreboard

- **Win**: fully-fused wav->mel frontend, 1.4x best-XLA at serving
  precision (above) — layout-bound problem, kernel controls traffic.
- **Win (round 3)**: fused attentive-pooling kernel with recompute
  custom-VJP backward + epilog-BN fold (`ops/pallas/pool.py`): replaces
  ~2.7 ms of XLA pooling-region work in the train step with 0.27 ms fwd +
  0.91 ms bwd, and lifts bf16 serving stacks ~20% (table above) — the
  [B, T, 1536] energies/activations never exist in HBM.
- **Draw**: DFT..norm kernel with XLA framing — saves the spectrum
  round-trip but keeps the frames one.
- **Loss (kept, documented)**: fused mega-block chain; int8 matmuls —
  GEMM-bound problems where XLA/MXU already sit at the roofline.
"""

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
    floor = measure_rtt_floor()
    print(f"rtt floor: {floor*1e3:.2f} ms", flush=True)

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
            v, x, floor,
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
        n = 32
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = train_step(state, wav, lengths, speakers, **kw)
        float(m["loss"])
        dt_train = (time.perf_counter() - t0 - floor) / n
        rows.append(
            (size.upper(), model.n_mega_blocks, params_m,
             dt_inf * 1e3, B / dt_inf, dt_train * 1e3, B / dt_train)
        )
        print(rows[-1], flush=True)

    with open("BENCHMARKS.md", "w") as f:
        f.write(
            "# Benchmarks — TPU v5e, one chip\n\n"
            f"3-second utterances (301 mel frames), batch {B}, bf16 activations,\n"
            "rbg PRNG, device-side chained timing with the relay's fixed\n"
            "dispatch+readback floor subtracted (see Methodology below).\n"
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
            "\nHeadlines at B=128 are produced by the one-line JSON scripts "
            "(run them for current numbers; last recorded values live in "
            "README.md): `python bench.py` (mel->embedding utt/s/chip vs the "
            "CPU reference) and `python bench_train.py` (train-step utt/s).\n"
        )
        f.write(EXTRA_SECTIONS)
    print("wrote BENCHMARKS.md")


if __name__ == "__main__":
    main()
