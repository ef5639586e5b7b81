"""Training-step benchmark: TitaNet-S wav -> grads -> update (utt/s/chip).

Prints ONE JSON line (same contract shape as bench.py):
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

The TPU side runs the FULL fused training step: on-device mel frontend +
SpecAugment (gated stretch + masking) -> TitaNet-S fwd/bwd -> Adam update,
CE head, 251 classes (LibriSpeech train-clean-100 scale). The baseline is
the reference PyTorch train step measured live on this host's CPU —
forward+loss+backward+Adam on PRE-COMPUTED mel (its frontend cost, which
runs per-example per-epoch in its DataLoader workers, is excluded — a
generosity to the baseline).

Timing methodology (remote-TPU relay; see bench.py): train_step threads the
DONATED TrainState, so a loop of steps is an inherently serial, unhoistable
chain with distinct arguments; a single loss readback at the end
synchronizes, and RTT amortizes over the chain.
"""

import json
import os
import sys
import time

import numpy as np

B = int(os.environ.get("TITANET_BENCH_BATCH", "128"))
B_CPU = 16
T_SECONDS = 3.0
SR = 16000
N_SAMPLES = int(T_SECONDS * SR)
N_MELS = 80
N_CLASSES = 251
DTYPE = "bfloat16"


def bench_tpu(wav: np.ndarray, speakers: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.augment import AugmentConfig
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer, train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    # TITANET_BENCH_FRONTEND=default measures the bf16 training frontend —
    # quality-validated on the hard-corpus EER benchmark (bench6 lands
    # inside the CE parity-frontend band, docs/eer_bench/RESULTS.md)
    import os

    frontend = FrontendConfig.from_ms(
        precision=os.environ.get("TITANET_BENCH_FRONTEND", "highest")
    )
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else None
    # TITANET_BENCH_SCAN=1 measures the scan_blocks encoder layout;
    # TITANET_BENCH_MODEL=ecapa measures the ECAPA-TDNN family (C=512)
    scan = os.environ.get("TITANET_BENCH_SCAN", "") == "1"
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
                            scan_blocks=scan)
    head = build_head("ce", 192, N_CLASSES)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt,
        jnp.zeros((2, 301, N_MELS)), N_CLASSES,
    )
    kw = dict(
        model=model, head=head, optimizer=opt, frontend=frontend,
        augment=AugmentConfig(probability=0.5),
    )
    x = jnp.asarray(wav, jnp.float32)
    # uniform 3 s batch: the training loop passes lengths=None for fully
    # packed buckets (train/loop.py) — same fast path measured here
    lengths = None
    spk = jnp.asarray(speakers, jnp.int32)

    # warm: compile + first step
    state, m = train_step(state, x, lengths, spk, **kw)
    float(m["loss"])
    # fixed ~25 ms dispatch+readback floor per synced call (bench_util)
    from bench_util import measure_rtt_floor

    floor = measure_rtt_floor()
    iters = 32
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, x, lengths, spk, **kw)
        float(m["loss"])  # the only sync
        times.append((time.perf_counter() - t0 - floor) / iters)
    return B / float(np.median(times))


def bench_cpu_reference(mel: np.ndarray, speakers: np.ndarray,
                        max_seconds: float = 90.0) -> float:
    """Reference torch train step on CPU: fwd+loss+bwd+Adam on mel input
    (reference train_one_epoch hot path, src/learn.py:95-119)."""
    sys.path.insert(0, "/root/reference/src")
    import torch

    import losses as ref_losses
    import models as ref_models

    torch.manual_seed(0)
    loss_fn = ref_losses.CELoss(192, N_CLASSES)
    model = ref_models.TitaNet(
        n_mels=N_MELS, n_mega_blocks=17, n_sub_blocks=3,
        encoder_hidden_size=256, encoder_output_size=1536,
        embedding_size=192, mega_block_kernel_size=3, dropout=0.5,
        loss_function=loss_fn,
    )
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.from_numpy(mel[:B_CPU].transpose(0, 2, 1).copy())
    spk = torch.from_numpy(speakers[:B_CPU].astype(np.int64))

    def step():
        optimizer.zero_grad()
        _, _, loss = model(x, speakers=spk)
        loss.backward()
        optimizer.step()

    t0 = time.perf_counter()
    step()  # warm
    warm = time.perf_counter() - t0
    iters = max(1, min(8, int(max_seconds / max(warm, 1e-3))))
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return B_CPU / dt


def main():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((B, N_SAMPLES)) * 0.1).astype(np.float32)
    speakers = rng.integers(0, N_CLASSES, B).astype(np.int32)
    tpu = bench_tpu(wav, speakers)
    try:
        mel = rng.standard_normal((B_CPU, 301, N_MELS)).astype(np.float32)
        cpu = bench_cpu_reference(mel, speakers)
        vs = tpu / cpu
    except Exception:
        cpu, vs = None, None
    print(
        json.dumps(
            {
                "metric": {"ecapa": "ECAPA-512", "xvector": "x-vector", "resnet": "ResNet34", "conformer": "MFA-Conformer"}.get(os.environ.get("TITANET_BENCH_MODEL", ""), "TitaNet-S") + " train step throughput (wav->grads->update)",
                "value": round(tpu, 1),
                "unit": "utt/s/chip",
                "vs_baseline": round(vs, 1) if vs is not None else None,
                "baseline_cpu_reference_utt_s": round(cpu, 2) if cpu else None,
                "batch": B,
                "n_classes": N_CLASSES,
                "dtype": DTYPE,
            }
        )
    )


if __name__ == "__main__":
    main()
