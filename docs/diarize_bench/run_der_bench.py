"""Diarization quality benchmark: calibrated AHC threshold vs NME-SC
(VERDICT r4 item 7 — "one quality lever beyond the embedder").

Protocol:
- Build conversations from the TEST split of a corpus tier by
  concatenating utterances of k speakers in shuffled turn order (known
  boundaries). DEV and TEST conversation sets use DISJOINT speaker
  groups, so the calibrated threshold is measured out-of-sample.
- Calibrate the AHC stop threshold on DEV
  (train/diarize.py calibrate_ahc_threshold), then score TEST with:
  NME-SC auto-k (the previous default), AHC at the uncalibrated 0.6
  default, and AHC at the dev-calibrated threshold.
- Two tiers: the hard scaled corpus (configs/bench21_scaled_eer.yml,
  embedder s21_ecapa_seed42) and the easy tier
  (configs/bench22_easy_eer.yml, embedder e22_ecapa_seed42 when the
  easy campaign has produced it, else the hard-trained embedder in
  domain transfer).

Writes docs/diarize_bench/DER.md. One TPU process; run while the chip
is free:

    python docs/diarize_bench/run_der_bench.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(REPO, "checkpoints", "eer_bench")

SPK_PER_CONV = 4
UTTS_PER_SPK = 3
N_CONV = 5  # per dev/test set (5 x 4 = 20 speakers each, disjoint)
OVERLAP_PROB = 0.5  # overlapped-speech variant: P(turn starts early)


def make_conversations(test_ds, sr, speaker_pool, n_conv, seed,
                       overlap_prob=0.0, overlap_range=(0.5, 1.2)):
    """``n_conv`` conversations over disjoint groups of SPK_PER_CONV
    speakers from ``speaker_pool`` (test-split speaker ids); returns
    ``[(waveform, [(start_s, end_s, local_spk)])]``.

    With ``overlap_prob`` > 0, a turn transition to a DIFFERENT speaker
    starts that many seconds early with that probability — the waveforms
    sum and the reference segments genuinely overlap (interruption-style
    overlapped speech)."""
    import numpy as np

    by_speaker = {}
    for i in range(len(test_ds)):
        by_speaker.setdefault(test_ds[i]["speaker_id"], []).append(i)
    rng = np.random.default_rng(seed)
    convs = []
    for c in range(n_conv):
        group = speaker_pool[c * SPK_PER_CONV:(c + 1) * SPK_PER_CONV]
        turns = []
        for u in range(UTTS_PER_SPK):
            for pos, spk in enumerate(group):
                turns.append((pos, by_speaker[spk][u]))
        rng.shuffle(turns)
        placed, t, prev_pos = [], 0, None  # (start_sample, wav, local_spk)
        for pos, idx in turns:
            wav = np.asarray(test_ds[idx]["waveform"], np.float32).reshape(-1)
            start = t
            if (prev_pos is not None and pos != prev_pos
                    and rng.random() < overlap_prob):
                o = int(rng.uniform(*overlap_range) * sr)
                start = max(t - min(o, len(wav) - 1), 0)
            placed.append((start, wav, pos))
            t = start + len(wav)
            prev_pos = pos
        buf = np.zeros(max(s + len(w) for s, w, _ in placed), np.float32)
        ref = []
        for s, w, pos in placed:
            buf[s:s + len(w)] += w
            ref.append((s / sr, (s + len(w)) / sr, pos))
        convs.append((buf, ref))
    return convs


def run_tier(tier, config_path, ckpt_name, overrides):
    import numpy as np

    from titanet_tpu.cli import _rebuild_state, _synthetic_kwargs
    from titanet_tpu.config import load_config
    from titanet_tpu.data import get_datasets
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state
    from titanet_tpu.train.diarize import (
        _activity_matrix,
        calibrate_ahc_threshold,
        calibrate_overlap_threshold,
        diarization_error_rate,
        diarize,
    )
    from titanet_tpu.train.extractor import SpeakerEmbedder

    cfg = load_config(config_path, overrides)
    _, _, test_ds, n_speakers = get_datasets(
        cfg.dataset.root, name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True, test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, _, frontend, abstract = _rebuild_state(cfg, n_speakers)
    state, epoch = ckpt.restore_latest(os.path.join(CKPT, ckpt_name), abstract)
    if state is None:
        return None
    state = ema_eval_state(state)
    embedder = SpeakerEmbedder(
        model, state.params["backbone"], state.batch_stats, frontend=frontend,
    )
    sr = cfg.audio.sample_rate

    # test-split speaker ids present in the subset, stable order
    sids = sorted({test_ds[i]["speaker_id"] for i in range(len(test_ds))})
    assert len(sids) >= 2 * N_CONV * SPK_PER_CONV, len(sids)
    dev_pool = sids[: N_CONV * SPK_PER_CONV]
    test_pool = sids[N_CONV * SPK_PER_CONV: 2 * N_CONV * SPK_PER_CONV]
    dev = make_conversations(test_ds, sr, dev_pool, N_CONV, seed=11)
    tst = make_conversations(test_ds, sr, test_pool, N_CONV, seed=13)

    best_th, sweep = calibrate_ahc_threshold(dev, embedder, sr)

    def mean_der(mode, **kw):
        ders = []
        for wav, ref in tst:
            segs = diarize(wav, sr, embedder, clustering=mode,
                           max_speakers=8, **kw)
            ders.append(diarization_error_rate(ref, segs))
        return float(np.mean(ders)), [round(d, 3) for d in ders]

    nmesc, nmesc_all = mean_der("nmesc")
    ahc_default, _ = mean_der("ahc", ahc_threshold=0.6)
    ahc_cal, ahc_all = mean_der("ahc", ahc_threshold=best_th)
    known_k, _ = mean_der("nmesc", n_speakers=SPK_PER_CONV)

    # --- overlapped speech: interruption-style overlaps at half the turn
    # transitions; overlap-emission knobs calibrated on the overlapped DEV
    # set (train/diarize.py calibrate_overlap_threshold), applied
    # out-of-sample on the overlapped TEST set.
    dev_ov = make_conversations(test_ds, sr, dev_pool, N_CONV, seed=11,
                                overlap_prob=OVERLAP_PROB)
    tst_ov = make_conversations(test_ds, sr, test_pool, N_CONV, seed=13,
                                overlap_prob=OVERLAP_PROB)
    ov_best, ov_sweep = calibrate_overlap_threshold(dev_ov, embedder, sr)

    def ov_frac(convs):
        fracs = []
        for _, ref in convs:
            end = max(e for _, e, _ in ref)
            act = _activity_matrix(ref, int(np.ceil(end / 0.01)), 0.01)
            n = act.sum(1)
            fracs.append(float((n >= 2).sum() / max(n.sum(), 1)))
        return float(np.mean(fracs))

    def mean_der_ov(**kw):
        ders = []
        for wav, ref in tst_ov:
            segs = diarize(wav, sr, embedder, max_speakers=8, **kw)
            ders.append(diarization_error_rate(ref, segs))
        return float(np.mean(ders)), [round(d, 3) for d in ders]

    ov_blind, ov_blind_all = mean_der_ov()
    if ov_best is not None:
        ov_aware, ov_aware_all = mean_der_ov(
            overlap_threshold=ov_best[0], overlap_margin=ov_best[1])
    else:  # dev said no setting beats silence on overlap — report blind
        ov_aware, ov_aware_all = ov_blind, ov_blind_all
    return {
        "tier": tier, "checkpoint": ckpt_name, "epoch": epoch,
        "ahc_threshold": best_th,
        "sweep": {f"{k:.2f}": round(v, 4) for k, v in sweep.items()},
        "der_nmesc_auto": nmesc, "der_nmesc_auto_per_conv": nmesc_all,
        "der_ahc_default": ahc_default,
        "der_ahc_calibrated": ahc_cal, "der_ahc_per_conv": ahc_all,
        "der_nmesc_known_k": known_k,
        "overlap": {
            "prob": OVERLAP_PROB,
            "ref_overlap_frac": ov_frac(tst_ov),
            "params": list(ov_best) if ov_best is not None else None,
            "der_blind": ov_blind, "der_blind_per_conv": ov_blind_all,
            "der_aware": ov_aware, "der_aware_per_conv": ov_aware_all,
            "dev_baseline": ov_sweep[None],
            "dev_best": ov_sweep[ov_best] if ov_best is not None
            else ov_sweep[None],
        },
    }


def _first_existing(names):
    for n in names:
        if os.path.isdir(os.path.join(CKPT, n)):
            return n
    return None


def main():
    rows = []
    # Embedders are ECAPA-TDNN C=512 trained OPEN-SET on each tier
    # (test.exclusive_speakers: the conversation speakers — drawn from the
    # test split — are unseen during embedder training). diar_ecapa_hard =
    # the s21_ecapa_openset_seed42 recipe retrained (campaign checkpoints
    # are pruned after scoring); train it with:
    #   python - <<'EOF'
    #   from titanet_tpu.cli import train
    #   from titanet_tpu.config import load_config
    #   train(load_config("configs/bench21_scaled_eer.yml",
    #         {"ecapa.enabled": True, "generic.seed": 42,
    #          "test.exclusive_speakers": True,
    #          "training.run_name": "diar_ecapa_hard"}))
    #   EOF
    hard_ck = _first_existing(["diar_ecapa_hard", "s21_ecapa_seed42"])
    easy_ck = _first_existing(
        ["e22_ecapa_seed42", "e22_ecapa_seed43", "e22_ecapa_seed44"])
    tiers = []
    if hard_ck:
        ov = {"ecapa.enabled": True}
        if hard_ck == "diar_ecapa_hard":
            # open-set-trained embedder: the restore's abstract head must
            # match the open-set train-speaker count
            ov["test.exclusive_speakers"] = True
        tiers.append(
            ("hard", os.path.join(REPO, "configs", "bench21_scaled_eer.yml"),
             hard_ck, ov))
    if easy_ck:
        tiers.append(
            ("easy", os.path.join(REPO, "configs", "bench22_easy_eer.yml"),
             easy_ck, {"ecapa.enabled": True}))
    for tier, cfgp, name, ov in tiers:
        row = run_tier(tier, cfgp, name, ov)
        if row is None:
            print(f"[skip] {tier}: checkpoint {name} missing")
            continue
        print(json.dumps(row), flush=True)
        rows.append(row)
    write_md(rows)


def write_md(rows):
    lines = [
        "# Diarization: calibrated AHC threshold vs NME-SC",
        "",
        "Conversations: 5 dev + 5 test per tier, 4 speakers x 3",
        "utterances each in shuffled turn order, DISJOINT dev/test",
        "speaker groups drawn from the tier's 40 test-split speakers.",
        "The AHC stop threshold is swept on the dev conversations",
        "(train/diarize.py calibrate_ahc_threshold) and applied",
        "out-of-sample; NME-SC auto-k is the previous default.",
        "",
        "| tier | NME-SC auto | AHC @0.6 default | AHC @calibrated "
        "| calibrated th | NME-SC known-k |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['tier']} | {r['der_nmesc_auto']:.3f} "
            f"| {r['der_ahc_default']:.3f} | {r['der_ahc_calibrated']:.3f} "
            f"| {r['ahc_threshold']:.2f} | {r['der_nmesc_known_k']:.3f} |"
        )
    lines.append("")
    for r in rows:
        d = r["der_nmesc_auto"] - r["der_ahc_calibrated"]
        lines.append(
            f"- {r['tier']}: calibration moves DER by {d:+.3f} vs the "
            f"NME-SC default (threshold sweep: {r['sweep']})."
        )
    lines += [
        "",
        "## Overlapped speech",
        "",
        "Same conversations rebuilt with interruption-style overlaps: at",
        f"P={rows[0]['overlap']['prob']} of different-speaker turn",
        "transitions the next utterance starts 0.5-1.2 s early (waveforms",
        "sum; reference segments genuinely overlap). DER here is the",
        "overlap-aware NIST form (denominator = total reference speaker",
        "time). 'aware' = NME-SC + runner-up-centroid overlap emission",
        "(train/diarize.py overlap_assign) with (threshold, margin)",
        "calibrated on the overlapped DEV set, applied out-of-sample.",
        "",
        "| tier | ref overlap frac | DER overlap-blind | DER overlap-aware "
        "| calibrated (th, margin) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        o = r["overlap"]
        p = (f"({o['params'][0]:.2f}, {o['params'][1]:.2f})"
             if o["params"] else "none beat blind on dev")
        lines.append(
            f"| {r['tier']} | {o['ref_overlap_frac']:.3f} "
            f"| {o['der_blind']:.3f} | {o['der_aware']:.3f} | {p} |"
        )
    lines.append("")
    for r in rows:
        o = r["overlap"]
        lines.append(
            f"- {r['tier']}: overlap emission moves test DER by "
            f"{o['der_aware'] - o['der_blind']:+.3f} "
            f"(dev: {o['dev_baseline']:.3f} -> {o['dev_best']:.3f})."
        )
    with open(os.path.join(OUT_DIR, "DER.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
