"""BASELINE.json config 5: batched streaming embedding extraction on a
corpus (e.g. VCTK) with cross-dataset verification + SVD/UMAP projections.

The reference did this in notebook cells 75-118 one utterance at a time;
here extraction is batched/bucketed with host prefetch overlapping device
compute ("streaming": the loader stages the next batches while the TPU
embeds the current one).

    python examples/extract_embeddings.py --dataset synthetic \
        [--checkpoint-dir ...] [--outdir /tmp/embeddings]
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
    parser.add_argument("--dataset", default="synthetic",
                        choices=["synthetic", "librispeech", "vctk", "voxceleb1"])
    parser.add_argument("--dataset-root", default="./data")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="restore TitaNet-S weights (random init otherwise)")
    parser.add_argument("--model-size", default="s")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--outdir", default="/tmp/embeddings")
    parser.add_argument("--reduction", default="svd", choices=["svd", "tsne", "umap"])
    args = parser.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from titanet_tpu.data import DATASETS, ChunkConfig, DataLoader
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import embed_step
    from titanet_tpu.train.metrics import all_pairs_scores_labels, get_test_metrics
    from titanet_tpu.utils.viz import visualize_embeddings

    if args.dataset == "synthetic":
        ds = DATASETS["synthetic"](n_speakers=10, utterances_per_speaker=10)
    else:
        ds = DATASETS[args.dataset](args.dataset_root)
    cfg = FrontendConfig.from_ms()
    model = get_titanet(model_size=args.model_size)
    mel0 = jnp.zeros((1, 301, 80))
    variables = jax.jit(model.init)(jax.random.key(0), mel0)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if args.checkpoint_dir:
        from titanet_tpu.train import checkpoint as ckpt
        from titanet_tpu.losses.heads import build_head
        from titanet_tpu.train import create_train_state, make_optimizer

        abstract = create_train_state(
            jax.random.key(0), model, build_head("ce", model.embedding_size,
                                                 ds.get_num_speakers()),
            make_optimizer(), mel0, ds.get_num_speakers(),
        )
        state, epoch = ckpt.restore_latest(args.checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(args.checkpoint_dir)
        params, batch_stats = state.params["backbone"], state.batch_stats
        print(f"restored epoch {epoch}")

    loader = DataLoader(
        ds, batch_size=args.batch_size, shuffle=False, drop_last=False,
        chunk=ChunkConfig(enabled=False), prefetch=2,
    )
    import time

    embeddings, speakers = [], []
    t0 = time.perf_counter()
    for batch in loader:
        emb = embed_step(
            params, batch_stats,
            jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
            model=model, frontend=cfg,
        )
        embeddings.append(np.asarray(emb))
        speakers.extend(batch.speaker_ids.tolist())
    emb = np.concatenate(embeddings)
    dt = time.perf_counter() - t0
    print(f"extracted {len(emb)} embeddings in {dt:.2f}s "
          f"({len(emb) / dt:.1f} utt/s COLD — includes per-bucket jit "
          "compiles and host decode; steady-state device throughput is "
          "~4 orders of magnitude higher, see BENCHMARKS.md)")

    np.save(os.path.join(args.outdir, "embeddings.npy"), emb)
    np.save(os.path.join(args.outdir, "speakers.npy"), np.asarray(speakers))
    fig = visualize_embeddings(
        emb, speakers, reduction_method=args.reduction,
        save=os.path.join(args.outdir, f"projection_{args.reduction}.png"),
    )
    scores, labels = all_pairs_scores_labels(emb, speakers)
    print("verification:", get_test_metrics(scores, labels, prefix="xds"))
    print("projection:", fig)


if __name__ == "__main__":
    main()
