"""DET-curve overlay for one scaled-regime (s21) run: scoring backends.

One restore + one embed (same recipe as rescore_scaled.py), then a
single probit-axis DET figure overlaying

    raw cosine | S-norm | AS-norm(top-100) | PLDA

via titanet_tpu.utils.viz.plot_det_curve. Writes
``docs/eer_bench/det_<run>.png``.

    python docs/eer_bench/plot_det_scaled.py [--run s21_ce_seed42]

Reference counterpart: none (the reference's only verification output
is scalar EER/minDCF, /root/reference/src/learn.py:437-459).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT_DIR = os.path.dirname(os.path.abspath(__file__))

from rescore_scaled import CKPT_ROOT, CONFIG, MAX_PLDA_TRAIN  # noqa: E402


def main():
    import numpy as np

    from run_eer_bench_scaled import _runs  # noqa: E402

    from titanet_tpu.cli import _cohort_loader, _rebuild_state, _synthetic_kwargs
    from titanet_tpu.config import load_config
    from titanet_tpu.data import ChunkConfig, DataLoader, Subset, get_datasets
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state
    from titanet_tpu.train.loop import _embed_whole_utterances
    from titanet_tpu.train.metrics import (
        all_pairs_scores_labels,
        cross_cosine_scores,
        snorm_scores,
    )
    from titanet_tpu.train.plda import PLDA
    from titanet_tpu.utils.viz import plot_det_curve

    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="s21_ce_seed42")
    args = ap.parse_args()

    overrides = dict(dict(_runs())[args.run])
    for k in list(overrides):
        if k.startswith("distill."):
            overrides.pop(k)
    overrides["test.score_norm"] = "asnorm"
    cfg = load_config(CONFIG, overrides)
    train_ds, _, test_ds, n_speakers = get_datasets(
        cfg.dataset.root, name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True, test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, _, frontend, abstract = _rebuild_state(cfg, n_speakers)
    state, epoch = ckpt.restore_latest(
        os.path.join(CKPT_ROOT, args.run), abstract)
    assert state is not None, f"no checkpoint for {args.run}"
    state = ema_eval_state(state)

    test_loader = DataLoader(
        test_ds, batch_size=cfg.validation.batch_size, shuffle=False,
        drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
    )
    cohort_loader, topk = _cohort_loader(cfg, train_ds)
    rng = np.random.default_rng(cfg.generic.seed)
    idx = rng.permutation(len(train_ds))[:MAX_PLDA_TRAIN].tolist()
    plda_loader = DataLoader(
        Subset(train_ds, idx), batch_size=cfg.validation.batch_size,
        shuffle=False, drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
    )
    emb, spk = _embed_whole_utterances(
        state, test_loader, model=model, frontend=frontend)
    cohort_emb, _ = _embed_whole_utterances(
        state, cohort_loader, model=model, frontend=frontend)
    fit_emb, fit_spk = _embed_whole_utterances(
        state, plda_loader, model=model, frontend=frontend)

    scores_cos, labels = all_pairs_scores_labels(emb, spk)
    cohort = cross_cosine_scores(emb, cohort_emb)
    sq = scores_cos.reshape(len(spk), len(spk))
    plda = PLDA.fit(fit_emb, fit_spk)
    systems = {
        "cosine": (scores_cos, labels),
        "S-norm": (snorm_scores(sq, cohort, cohort).reshape(-1), labels),
        f"AS-norm top-{topk}": (
            snorm_scores(sq, cohort, cohort, topk=topk).reshape(-1), labels),
        "PLDA": (plda.score_pairs(emb).reshape(-1), labels),
    }
    out = os.path.join(OUT_DIR, f"det_{args.run}.png")
    plot_det_curve(systems, save=out)
    print(f"wrote {out} (epoch {epoch}, {len(spk)} test utts)")


if __name__ == "__main__":
    main()
