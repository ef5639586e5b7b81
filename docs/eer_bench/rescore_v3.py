"""Rescore the OPEN-SET scaled runs: cosine vs S/AS-norm vs PLDA with
fits that contain NO test-speaker identities (VERDICT r4 item 1's second
half — the round-4 RESCORE_v2 PLDA headline was fit under the
reference's closed-set split, where the 40 test speakers' surplus train
utterances reach the PLDA fit and cohort).

Under ``test.exclusive_speakers: true`` the TRAIN split holds only the
216 non-test speakers, so a train-split PLDA fit / AS-norm cohort is
clean by construction: this is the protocol PLDA is actually deployed
under (fit on a training corpus, score unseen identities).

    python docs/eer_bench/rescore_v3.py [--only PREFIX] [--runs easy]

Writes RESCORE_v3.md: per-family cosine-vs-PLDA table under open-set
and the round-4 "best scoring stack" headline restated (validated or
retracted). Reference counterpart: none (the reference scores raw
cosine only, /root/reference/src/learn.py:437-439).

``--runs easy`` rescopes the same protocol to the easy tier
(configs/bench22_easy_eer.yml, also open-set): the regime where
minDCF(p=0.01) is informative (EASYTIER.md), answering whether the
scoring stacks that win EER also win the strict-FA operating point.
Writes RESCORE_easy.md.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT_ROOT = os.path.join(REPO, "checkpoints", "eer_bench")
CONFIG = os.path.join(REPO, "configs", "bench21_scaled_eer.yml")

MAX_PLDA_TRAIN = 4096  # ~19/spk x 216 train-only speakers


def main():
    import numpy as np

    from run_eer_bench_v3 import _easy_runs, _openset_runs  # noqa: E402

    from titanet_tpu.cli import _cohort_loader, _rebuild_state, _synthetic_kwargs
    from titanet_tpu.config import load_config
    from titanet_tpu.data import ChunkConfig, DataLoader, Subset, get_datasets
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state, get_test_metrics
    from titanet_tpu.train.loop import _embed_whole_utterances
    from titanet_tpu.train.metrics import (
        all_pairs_scores_labels,
        cross_cosine_scores,
        snorm_scores,
    )
    from titanet_tpu.train.plda import PLDA

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="run-name prefix filter")
    ap.add_argument("--runs", choices=("openset", "easy"), default="openset")
    args = ap.parse_args()

    easy = args.runs == "easy"
    config = (os.path.join(REPO, "configs", "bench22_easy_eer.yml")
              if easy else CONFIG)
    runs_fn = _easy_runs if easy else _openset_runs
    writer = write_results_easy if easy else write_results
    ledger_path = os.path.join(
        OUT_DIR, "rescore_easy.json" if easy else "rescore_v3.json")
    rows = []
    done = {}
    if os.path.exists(ledger_path):
        rows = json.load(open(ledger_path))
        done = {r["run"]: r for r in rows}
    for name, overrides in runs_fn():
        if args.only and not name.startswith(args.only):
            continue
        if name in done:
            print(f"[skip] {name}: already rescored")
            continue
        run_dir = os.path.join(CKPT_ROOT, name)
        if not os.path.isdir(run_dir):
            continue
        overrides = dict(overrides)
        overrides.pop("distill.enabled", None)  # eval-time rebuild only
        overrides.pop("distill.teacher_checkpoint", None)
        overrides.pop("distill.teacher_overrides", None)
        overrides.pop("distill.alpha", None)
        overrides["test.score_norm"] = "asnorm"  # cohort loader on
        cfg = load_config(config, overrides)
        assert cfg.test.exclusive_speakers, name
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
        rng = np.random.default_rng(cfg.generic.seed)
        idx = rng.permutation(len(train_ds))[:MAX_PLDA_TRAIN].tolist()
        plda_loader = DataLoader(
            Subset(train_ds, idx), batch_size=cfg.validation.batch_size,
            shuffle=False, drop_last=False, chunk=ChunkConfig(enabled=False),
            sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
        )
        emb, spk = _embed_whole_utterances(
            state, test_loader, model=model, frontend=frontend
        )
        cohort_emb, _ = _embed_whole_utterances(
            state, cohort_loader, model=model, frontend=frontend
        )
        fit_emb, fit_spk = _embed_whole_utterances(
            state, plda_loader, model=model, frontend=frontend
        )
        # open-set guarantee: the fit/cohort speaker sets must not touch
        # the test speakers
        assert not set(fit_spk) & set(spk), "PLDA fit saw test identities"
        n_fit_spk = len(set(fit_spk))
        plda = PLDA.fit(fit_emb, fit_spk)
        plda_rank = PLDA.fit(fit_emb, fit_spk, rank=min(n_fit_spk - 1, 191))
        scores_cos, labels = all_pairs_scores_labels(emb, spk)
        cohort = cross_cosine_scores(emb, cohort_emb)
        sq = scores_cos.reshape(len(spk), len(spk))
        variants = {
            "cosine": scores_cos,
            "snorm": snorm_scores(sq, cohort, cohort).reshape(-1),
            "asnorm": snorm_scores(sq, cohort, cohort, topk=topk).reshape(-1),
            "plda": plda.score_pairs(emb).reshape(-1),
            "plda_rank": plda_rank.score_pairs(emb).reshape(-1),
        }
        row = {
            "run": name, "epoch": epoch,
            "plda_train_utts": len(fit_emb),
            "plda_train_speakers": int(n_fit_spk),
            "cohort_size": len(cohort_emb),
        }
        for variant, s in variants.items():
            m = get_test_metrics(
                s, labels, mindcf_p_target=cfg.test.mindcf_p_target,
                mindcf_c_fa=cfg.test.mindcf_c_fa,
                mindcf_c_miss=cfg.test.mindcf_c_miss,
            )
            row[f"{variant}_eer"] = m["eer"]
            row[f"{variant}_mindcf"] = m["mindcf"]
        print(json.dumps(row), flush=True)
        rows.append(row)
        with open(ledger_path, "w") as f:
            json.dump(rows, f, indent=1)
        writer(rows)

    if not rows:
        print("no matching checkpoints found")
        return
    writer(rows)


FAMS = [
    ("s21_ce_openset", "CE TitaNet-S"),
    ("s21_arc_openset", "Arc TitaNet-S"),
    ("s21_ecapa_openset", "ECAPA"),
    ("s21_conformer_openset", "MFA-Conformer"),
    ("s21_ce_ema_openset", "CE+EMA TitaNet-S"),
    ("s21_distill_xvector_openset", "distilled x-vector"),
]


def write_results(rows):
    import numpy as np

    lines = [
        "# Scoring backends under the OPEN-SET protocol (RESCORE v3)",
        "",
        "Every completed open-set scaled run (test.exclusive_speakers:",
        "the 40 test speakers contribute nothing to train/val), rescored",
        "from one restore + one embed per run. PLDA fit and AS-norm",
        "cohort come from the TRAIN split, which under this protocol",
        "holds ONLY the 216 non-test speakers — the fits see no test",
        "identities (asserted at runtime), unlike RESCORE_v2's",
        "closed-set fits. This is the deployment protocol for PLDA:",
        "fit once on the training corpus, score unseen identities.",
        "",
        "| run | EER cos | EER S | EER AS | EER PLDA | EER PLDAr "
        "| DCF cos | DCF PLDA |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['run']} | {r['cosine_eer']:.3f} | {r['snorm_eer']:.3f} "
            f"| {r['asnorm_eer']:.3f} | {r['plda_eer']:.3f} "
            f"| {r['plda_rank_eer']:.3f} | {r['cosine_mindcf']:.3f} "
            f"| {r['plda_mindcf']:.3f} |"
        )
    lines.append("")
    for v in ("snorm", "asnorm", "plda", "plda_rank"):
        d = [r["cosine_eer"] - r[f"{v}_eer"] for r in rows]
        lines.append(
            f"- Mean EER delta (cosine - {v}): {np.mean(d):+.4f} "
            f"(± {np.std(d):.4f}, n={len(d)}; positive = {v} better)."
        )
    lines.append("")
    lines.append("## Cosine vs PLDA by family (open-set)")
    lines.append("")
    lines.append("| family | EER cosine | EER PLDA | PLDA - cosine |")
    lines.append("|---|---|---|---|")
    best = None
    for prefix, label in FAMS:
        sub = [r for r in rows if r["run"].startswith(prefix)]
        if not sub:
            continue
        c = np.mean([r["cosine_eer"] for r in sub])
        p = np.mean([r["plda_eer"] for r in sub])
        lines.append(
            f"| {label} (n={len(sub)}) | {c:.3f} | {p:.3f} | {p - c:+.3f} |"
        )
        if best is None or min(p, c) < best[1]:
            best = ((label, "PLDA") if p < c else (label, "cosine"),
                    min(p, c))
    if best is not None:
        (label, backend), eer = best
        lines.append("")
        lines.append(
            f"- Best scoring stack UNDER OPEN-SET: **{label} + {backend}** "
            f"(mean EER {eer:.3f}). Compare RESCORE_v2's closed-set"
            " headline (MFA-Conformer + PLDA, 0.163) — deltas between the"
            " two protocols isolate how much of the PLDA win was"
            " seen-identity leakage into the fit."
        )
    with open(os.path.join(OUT_DIR, "RESCORE_v3.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


FAMS_EASY = [
    ("e22_ce_seed", "CE TitaNet-S"),
    ("e22_arc_seed", "Arc TitaNet-S"),
    ("e22_ecapa_seed", "ECAPA"),
    ("e22_conformer_seed", "MFA-Conformer"),
    ("e22_xvector_seed", "x-vector"),
]


def write_results_easy(rows):
    import numpy as np

    lines = [
        "# Scoring backends in the informative-minDCF regime (easy tier)",
        "",
        "Every easy-tier run whose checkpoint survives (the campaign",
        "prunes scored checkpoints), rescored from one restore + one",
        "embed per run: cosine vs S/AS-norm vs PLDA (full-rank and",
        "rank-191), fits/cohorts from the TRAIN split only (open-set",
        "protocol, leakage asserted at runtime). The question EASYTIER.md",
        "leaves open: do the scoring stacks that win EER also win",
        "minDCF(p=0.01) where that metric actually discriminates?",
        "",
        "| run | EER cos | EER AS | EER PLDA | DCF cos | DCF S "
        "| DCF AS | DCF PLDA | DCF PLDAr |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['run']} | {r['cosine_eer']:.4f} | {r['asnorm_eer']:.4f} "
            f"| {r['plda_eer']:.4f} | {r['cosine_mindcf']:.3f} "
            f"| {r['snorm_mindcf']:.3f} | {r['asnorm_mindcf']:.3f} "
            f"| {r['plda_mindcf']:.3f} | {r['plda_rank_mindcf']:.3f} |"
        )
    lines.append("")
    for v in ("snorm", "asnorm", "plda", "plda_rank"):
        de = [r["cosine_eer"] - r[f"{v}_eer"] for r in rows]
        dd = [r["cosine_mindcf"] - r[f"{v}_mindcf"] for r in rows]
        lines.append(
            f"- {v} vs cosine: mean EER delta {np.mean(de):+.4f} "
            f"(± {np.std(de):.4f}), mean minDCF(p=0.01) delta "
            f"{np.mean(dd):+.3f} (± {np.std(dd):.3f}, n={len(dd)}; "
            "positive = better than cosine)."
        )
    lines.append("")
    lines.append("## By family")
    lines.append("")
    lines.append(
        "| family | EER cos | EER best-alt | DCF cos | DCF best-alt "
        "| best alt |")
    lines.append("|---|---|---|---|---|---|")
    variants = ("snorm", "asnorm", "plda", "plda_rank")
    for prefix, label in FAMS_EASY:
        sub = [r for r in rows if r["run"].startswith(prefix)]
        if not sub:
            continue
        ce = np.mean([r["cosine_eer"] for r in sub])
        cd = np.mean([r["cosine_mindcf"] for r in sub])
        alt = min(variants,
                  key=lambda v: np.mean([r[f"{v}_mindcf"] for r in sub]))
        ae = np.mean([r[f"{alt}_eer"] for r in sub])
        ad = np.mean([r[f"{alt}_mindcf"] for r in sub])
        lines.append(
            f"| {label} (n={len(sub)}) | {ce:.4f} | {ae:.4f} | {cd:.3f} "
            f"| {ad:.3f} | {alt} |"
        )
    with open(os.path.join(OUT_DIR, "RESCORE_easy.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
