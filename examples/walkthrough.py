"""Notebook-equivalent walkthrough (the role ``titanet.ipynb`` plays in the
reference — dataset EDA, transform demos, model inspection, training,
embedding visualization). Runs end-to-end on the synthetic corpus so it
works without any downloaded data; point ``--dataset-root`` at LibriSpeech
for the real thing.

    python examples/walkthrough.py [--outdir /tmp/titanet_walkthrough]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="/tmp/titanet_walkthrough")
    parser.add_argument("--dataset-root", default=None,
                        help="LibriSpeech root; defaults to synthetic corpus")
    args = parser.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from titanet_tpu.data import (
        ChunkConfig, DataLoader, LibriSpeechDataset, SyntheticSpeakerDataset,
    )
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import count_params, get_titanet, l2_normalize
    from titanet_tpu.ops.augment import reverb, spec_augment
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from titanet_tpu.train import create_train_state, make_optimizer, train_step
    from titanet_tpu.train.metrics import all_pairs_scores_labels, get_test_metrics
    from titanet_tpu.utils.viz import plot_spectrogram, visualize_embeddings

    # ---------------- dataset EDA (reference notebook cells 10-25) --------
    if args.dataset_root:
        ds = LibriSpeechDataset(args.dataset_root)
    else:
        ds = SyntheticSpeakerDataset(n_speakers=8, utterances_per_speaker=10)
    print("dataset info:", ds.info())

    # ---------------- transform demos (cells 26-45) -----------------------
    cfg = FrontendConfig.from_ms()
    ex = ds[0]
    wav = jnp.asarray(ex["waveform"][0])[None, :]
    mel, _ = jax.jit(lambda w: log_mel_spectrogram(w, cfg))(wav)
    print("mel:", mel.shape)
    plot_spectrogram(np.asarray(mel[0]), save=os.path.join(args.outdir, "mel.png"))

    # jit everything driven interactively: un-jitted calls dispatch per-op
    # through the TPU tunnel (very slow)
    aug = jax.jit(lambda k, m: spec_augment(k, m, probability=1.0))(
        jax.random.key(0), mel
    )
    plot_spectrogram(np.asarray(aug[0]), save=os.path.join(args.outdir, "specaugment.png"))

    rir = jnp.asarray(np.random.default_rng(0).standard_normal(2000) * 0.05)
    wet = jax.jit(reverb)(wav, rir)
    print("reverb:", wet.shape)

    # ---------------- model inspection (cells 50-70) ----------------------
    for size in "sml":
        model = get_titanet(model_size=size)
        print(f"TitaNet-{size.upper()}: {model.n_mega_blocks} mega blocks, "
              f"{count_params(model)/1e6:.2f} M params")

    # ---------------- short training run (cell 71) ------------------------
    n_speakers = ds.get_num_speakers()
    model = get_titanet(model_size="s", n_mega_blocks=2)
    head = build_head("ce", 192, n_speakers)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 151, 80)), n_speakers
    )
    loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=True), prefetch=0)
    for epoch in range(2):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            state, metrics = train_step(
                state, jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
                jnp.asarray(batch.speaker_ids),
                model=model, head=head, optimizer=opt, frontend=cfg,
            )
            losses.append(float(metrics["loss"]))
        print(f"epoch {epoch}: loss {np.mean(losses):.3f}")

    # -------- embedding extraction + visualization (cells 75-118) ---------
    from titanet_tpu.train import embed_step

    emb, speakers = [], []
    loader.set_epoch(0)
    for batch in loader:
        e = embed_step(
            state.params["backbone"], state.batch_stats,
            jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
            model=model, frontend=cfg,
        )
        emb.append(np.asarray(e))
        speakers.extend(batch.speaker_ids.tolist())
    emb = np.concatenate(emb)
    fig = visualize_embeddings(
        emb, speakers, reduction_method="svd",
        save=os.path.join(args.outdir, "embeddings_svd.png"),
    )
    print("embedding figure:", fig)

    scores, labels = all_pairs_scores_labels(emb, speakers)
    print("verification:", get_test_metrics(scores, labels, prefix="demo"))
    print("done; artifacts in", args.outdir)


if __name__ == "__main__":
    main()
