"""Speaker-diarization demo: who spoke when, with a trained checkpoint.

Builds a multi-speaker conversation by concatenating utterances from N
distinct speakers of the config's dataset, then runs the full pipeline
(`titanet_tpu.train.diarize`): sliding windows -> batched TPU embeddings
(SpeakerEmbedder) -> refined spectral clustering (eigengap speaker count)
-> segments, and scores the frame-based DER against the known boundaries.

    python examples/diarize.py -p configs/bench5_hard_synth_eer.yml \\
        -c checkpoints/eer_bench/bench13_ecapa_seed42 \\
        -o 'ecapa.enabled=true'

(No reference counterpart — the reference stops at pairwise verification.)
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--params", required=True)
    ap.add_argument("-c", "--checkpoint-dir", required=True)
    ap.add_argument("-o", "--override", action="append", default=[],
                    help="key=value config overrides (value parsed as YAML)")
    ap.add_argument("--speakers", type=int, default=3)
    ap.add_argument("--utterances", type=int, default=3,
                    help="utterances per speaker in the conversation")
    ap.add_argument("--window", type=float, default=1.5)
    ap.add_argument("--hop", type=float, default=0.75)
    ap.add_argument("--known-k", action="store_true",
                    help="pass the true speaker count instead of eigengap")
    ap.add_argument("--overlap", type=float, default=None, metavar="TH",
                    help="emit overlapped second speakers: runner-up "
                         "centroid threshold (calibrate via "
                         "calibrate_overlap_threshold)")
    ap.add_argument("--overlap-margin", type=float, default=0.15)
    ap.add_argument("--vad", action="store_true",
                    help="place windows only inside energy-VAD speech regions")
    args = ap.parse_args(argv)

    import yaml

    overrides = {}
    for item in args.override:
        key, _, val = item.partition("=")
        overrides[key] = yaml.safe_load(val)

    from titanet_tpu.cli import _rebuild_state, _synthetic_kwargs
    from titanet_tpu.config import load_config
    from titanet_tpu.data import get_datasets
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state
    from titanet_tpu.train.diarize import diarization_error_rate, diarize
    from titanet_tpu.train.extractor import SpeakerEmbedder

    cfg = load_config(args.params, overrides)
    train_ds, _, test_ds, n_speakers = get_datasets(
        cfg.dataset.root, name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True, test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        **_synthetic_kwargs(cfg),
    )
    model, _, frontend, abstract = _rebuild_state(cfg, n_speakers)
    state, epoch = ckpt.restore_latest(args.checkpoint_dir, abstract)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {args.checkpoint_dir}")
    state = ema_eval_state(state)
    print(f"[restored epoch {epoch} from {args.checkpoint_dir}]")

    # conversation: round-robin utterances from the first N test speakers
    # (held-out identities); ground-truth boundaries recorded as we go
    sr = cfg.audio.sample_rate
    rng = np.random.default_rng(cfg.generic.seed)
    by_speaker = {}
    for i in range(len(test_ds)):
        ex = test_ds[i]
        by_speaker.setdefault(ex["speaker_id"], []).append(i)
        if len(by_speaker) >= args.speakers and all(
            len(v) >= args.utterances for v in list(by_speaker.values())[: args.speakers]
        ):
            break
    chosen = list(by_speaker.keys())[: args.speakers]
    turns = []
    for u in range(args.utterances):
        for spk_pos, spk in enumerate(chosen):
            turns.append((spk_pos, by_speaker[spk][u]))
    rng.shuffle(turns)
    pieces, reference, t = [], [], 0.0
    for spk_pos, idx in turns:
        wav = np.asarray(test_ds[idx]["waveform"], np.float32).reshape(-1)
        pieces.append(wav)
        reference.append((t, t + len(wav) / sr, spk_pos))
        t += len(wav) / sr
    audio = np.concatenate(pieces)
    print(f"[conversation: {len(turns)} turns, {args.speakers} speakers, "
          f"{t:.1f} s]")

    embedder = SpeakerEmbedder(
        model, state.params["backbone"], state.batch_stats, frontend=frontend,
    )
    segments = diarize(
        audio, sr, embedder, window_s=args.window, hop_s=args.hop,
        n_speakers=args.speakers if args.known_k else None,
        max_speakers=max(8, args.speakers), vad=args.vad,
        overlap_threshold=args.overlap, overlap_margin=args.overlap_margin,
    )
    der = diarization_error_rate(reference, segments)
    n_found = len({s.speaker for s in segments})
    print(f"[diarized into {len(segments)} segments, "
          f"{n_found} speakers found (true: {args.speakers})]")
    for s in segments:
        print(f"  {s.start:7.2f}s - {s.end:7.2f}s  speaker {s.speaker}")
    print(f"DER: {der:.3f}")
    return der


if __name__ == "__main__":
    main()
