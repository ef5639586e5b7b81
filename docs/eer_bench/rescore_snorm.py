"""Rescore surviving EER-bench checkpoints with S-norm / AS-norm.

Measures what test-time cohort score calibration (``test.score_norm``,
train/metrics.py:snorm_scores — no reference counterpart) buys on the hard
synthetic corpus: restores each checkpoint once, embeds the 30x20 test
split and a 256-utterance train-split cohort once, then computes EER/minDCF
for raw cosine vs S-norm vs AS-norm(top-100) from the SAME embeddings.

    python docs/eer_bench/rescore_snorm.py

Writes SNORM.md next to this file.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT_ROOT = os.path.join(REPO, "checkpoints", "eer_bench")

RUNS = [
    ("bench12_ce_ema_seed42",
     {"training.loss": "ce", "generic.seed": 42, "training.ema_decay": 0.99}),
    ("bench12_ce_ema_seed43",
     {"training.loss": "ce", "generic.seed": 43, "training.ema_decay": 0.99}),
    ("bench12_ce_ema_seed44",
     {"training.loss": "ce", "generic.seed": 44, "training.ema_decay": 0.99}),
    ("bench10_cos_seed43", {"training.loss": "cos", "generic.seed": 43}),
    ("bench10_cos_seed44", {"training.loss": "cos", "generic.seed": 44}),
    ("bench11_sphere_seed43", {"training.loss": "sphere", "generic.seed": 43}),
    ("bench11_sphere_seed45", {"training.loss": "sphere", "generic.seed": 45}),
]


def main():
    import numpy as np

    from titanet_tpu.cli import _cohort_loader, _rebuild_state, _synthetic_kwargs
    from titanet_tpu.config import load_config
    from titanet_tpu.data import ChunkConfig, DataLoader, get_datasets
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state, get_test_metrics
    from titanet_tpu.train.loop import _embed_whole_utterances
    from titanet_tpu.train.metrics import (
        all_pairs_scores_labels,
        cross_cosine_scores,
        snorm_scores,
    )

    rows = []
    for name, overrides in RUNS:
        run_dir = os.path.join(CKPT_ROOT, name)
        if not os.path.isdir(run_dir):
            print(f"[skip] {name}: no checkpoint on disk")
            continue
        overrides = dict(overrides)
        overrides["test.score_norm"] = "asnorm"  # cohort loader on
        cfg = load_config(
            os.path.join(REPO, "configs", "bench5_hard_synth_eer.yml"), overrides
        )
        train_ds, _, test_ds, n_speakers = get_datasets(
            cfg.dataset.root, name=cfg.dataset.name,
            val=cfg.validation.enabled,
            val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
            test=True, test_speakers=cfg.test.num_speakers,
            test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
            **_synthetic_kwargs(cfg),
        )
        model, _, frontend, abstract = _rebuild_state(cfg, n_speakers)
        state, epoch = ckpt.restore_latest(run_dir, abstract)
        if state is None:
            print(f"[skip] {name}: restore failed")
            continue
        state = ema_eval_state(state)
        test_loader = DataLoader(
            test_ds, batch_size=cfg.validation.batch_size, shuffle=False,
            drop_last=False, chunk=ChunkConfig(enabled=False),
            sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
        )
        cohort_loader, topk = _cohort_loader(cfg, train_ds)
        emb, spk = _embed_whole_utterances(
            state, test_loader, model=model, frontend=frontend
        )
        cohort_emb, _ = _embed_whole_utterances(
            state, cohort_loader, model=model, frontend=frontend
        )
        scores, labels = all_pairs_scores_labels(emb, spk)
        cohort = cross_cosine_scores(emb, cohort_emb)
        sq = scores.reshape(len(spk), len(spk))
        variants = {
            "raw": scores,
            "snorm": snorm_scores(sq, cohort, cohort).reshape(-1),
            "asnorm": snorm_scores(sq, cohort, cohort, topk=topk).reshape(-1),
        }
        row = {"run": name, "epoch": epoch}
        for variant, s in variants.items():
            m = get_test_metrics(
                s, labels, mindcf_p_target=cfg.test.mindcf_p_target,
                mindcf_c_fa=cfg.test.mindcf_c_fa,
                mindcf_c_miss=cfg.test.mindcf_c_miss,
            )
            row[f"{variant}_eer"] = m["eer"]
            row[f"{variant}_mindcf"] = m["mindcf"]
        print(json.dumps(row))
        rows.append(row)

    if not rows:
        print("no checkpoints found")
        return
    lines = [
        "# S-norm / AS-norm rescoring (hard synthetic corpus)",
        "",
        "Test-time cohort score calibration (`test.score_norm`,",
        "`snorm_scores` in train/metrics.py — a capability beyond the",
        "reference, which scores raw cosines src/learn.py:437-439).",
        "Cohort: 256 train-split utterances (train speakers are disjoint",
        "from test speakers); AS-norm uses per-embedding top-100 cohort",
        "statistics. Same embeddings for all three columns (one restore +",
        "one embed per run); protocol as RESULTS.md (30 spk x 20 utt).",
        "",
        "| run | EER raw | EER S-norm | EER AS-norm | minDCF raw | minDCF AS-norm |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['run']} | {r['raw_eer']:.3f} | {r['snorm_eer']:.3f} | "
            f"{r['asnorm_eer']:.3f} | {r['raw_mindcf']:.3f} | "
            f"{r['asnorm_mindcf']:.3f} |"
        )
    import numpy as np

    d_s = [r["raw_eer"] - r["snorm_eer"] for r in rows]
    d_a = [r["raw_eer"] - r["asnorm_eer"] for r in rows]
    lines += [
        "",
        f"- Mean EER delta (raw - S-norm): {np.mean(d_s):+.3f} "
        f"(± {np.std(d_s):.3f}, n={len(d_s)}).",
        f"- Mean EER delta (raw - AS-norm): {np.mean(d_a):+.3f} "
        f"(± {np.std(d_a):.3f}, n={len(d_a)}).",
        "",
        "Positive delta = normalization improves EER. Enable in training",
        "configs via `test: {score_norm: asnorm}`.",
        "",
        "minDCF note: the normalized-score minDCF rises to ~1.0 — at this",
        "corpus's EER (~0.25-0.4) minDCF@0.01 is already saturated and",
        "non-informative (RESULTS.md null result); z-scoring spreads the",
        "score scale, which moves the (meaningless) saturated cost around.",
        "On a real corpus with stronger models, score normalization is",
        "precisely what improves minDCF; judge it there.",
    ]
    with open(os.path.join(OUT_DIR, "SNORM.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
