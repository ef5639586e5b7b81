"""Reference-torch head-to-head trainer (VERDICT r3 item 2).

Trains the REFERENCE'S OWN TitaNet — imported read-only from
``/root/reference/src`` (models.py:262-330, losses.py:22-183) — with the
reference's loop math (learn.py:204-310: Adam, ``zero_grad``/
``backward``/``step`` per batch, per-epoch shuffle) on the IDENTICAL
hard-synth corpus, splits, and all-pairs cosine protocol used by the
titanet_tpu EER benchmark (configs/bench5_hard_synth_eer.yml), so the
two implementations' EER bands compare head-to-head on the same data.

torchaudio is absent from this image, so the reference's MelSpectrogram
transform (transforms.py:111-203) is reproduced here in numpy on top of
titanet_tpu's parity-tested frontend constants (hann/padded window, HTK
mel filterbank — tests/test_frontend.py pins those against torch.stft
and the torchaudio melscale algorithm). SpecAugment (phase-vocoder
stretch + freq/time masks, one p=0.5 gate for the unit) follows
transforms.py:158-201; RandomChunk follows transforms.py:206-233.

The reference trains at ~1.5-3 utt/s on this 1-core CPU host (no CUDA),
so the head-to-head runs a REDUCED budget (default 12 epochs vs the
benchmark's 40). The matching titanet_tpu rows are produced at the same
12-epoch budget (``python docs/eer_bench/run_eer_bench.py --head2head``)
and both land in docs/eer_bench/RESULTS.md.

Run:  python docs/eer_bench/run_reference_torch.py [--epochs 12]
Results ledger: docs/eer_bench/head2head.json (reruns skip done seeds).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(1, "/root/reference/src")  # read-only import of the reference

import torch  # noqa: E402

from titanet_tpu.data.dataset import SyntheticSpeakerDataset  # noqa: E402
from titanet_tpu.ops.frontend import (  # noqa: E402
    mel_filterbank,
    padded_window,
)
from titanet_tpu.train.metrics import (  # noqa: E402
    all_pairs_scores_labels,
    get_test_metrics,
)

OUT_DIR = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(OUT_DIR, "head2head.json")

# bench5_hard_synth_eer.yml constants
SR = 16000
N_FFT, WIN, HOP, N_MELS = 512, 400, 160, 80
CHUNK_MAX_S, CHUNK_LENGTHS = 3.0, (1.5, 2.0, 3.0)
SPECAUG_P = 0.5
STRETCH_MIN, STRETCH_MAX = 0.95, 1.05
FREQ_MASK_RATIO, TIME_MASK_RATIO = 0.35, 0.15
BATCH = 64
EMB, N_SPK, UPS = 192, 64, 30
VAL_UPS, TEST_SPK, TEST_UPS = 10, 30, 20

_WINDOW = padded_window(N_FFT, WIN).astype(np.float64)
_MELFB = mel_filterbank(N_FFT // 2 + 1, N_MELS, SR).astype(np.float64)  # [F, M]


def stft_np(wav: np.ndarray) -> np.ndarray:
    """torch.stft(center=True, reflect? no — torch default center pad is
    'reflect' for torchaudio.Spectrogram) complex STFT -> [F, T']."""
    pad = N_FFT // 2
    x = np.pad(wav.astype(np.float64), pad, mode="reflect")
    n_frames = 1 + len(wav) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * _WINDOW[None, :]
    return np.fft.rfft(frames, axis=-1).T  # [F, T']


def phase_vocoder_np(spec: np.ndarray, rate: float) -> np.ndarray:
    """torchaudio phase_vocoder on [F, T] complex (transforms.py:154-175
    semantics; mirrors titanet_tpu.ops.augment.phase_vocoder)."""
    if rate == 1.0:
        return spec
    n_freq, n_time = spec.shape
    phi_advance = np.linspace(0, np.pi * HOP, n_freq)[:, None]
    time_steps = np.arange(0, n_time, rate)
    alphas = time_steps % 1.0
    spec_pad = np.pad(spec, [(0, 0), (0, 2)])
    idx = time_steps.astype(np.int64)
    s0, s1 = spec_pad[:, idx], spec_pad[:, idx + 1]
    angle_0, angle_1 = np.angle(s0), np.angle(s1)
    norm_0, norm_1 = np.abs(s0), np.abs(s1)
    phase = angle_1 - angle_0 - phi_advance
    phase = phase - 2.0 * np.pi * np.round(phase / (2.0 * np.pi))
    phase = phase + phi_advance
    phase = np.concatenate([angle_0[:, :1], phase[:, :-1]], axis=1)
    phase_acc = np.cumsum(phase, axis=1)
    mag = alphas * norm_1 + (1.0 - alphas) * norm_0
    return mag * np.exp(1j * phase_acc)


def _mask_along_axis(rng, spec, mask_param, axis):
    """torchaudio mask_along_axis: width ~ U(0, param), start ~ U(0, size-w)."""
    size = spec.shape[axis]
    value = rng.uniform(0.0, 1.0) * mask_param
    min_value = rng.uniform(0.0, 1.0) * (size - value)
    start, end = int(min_value), int(min_value + value)
    sl = [slice(None)] * spec.ndim
    sl[axis] = slice(start, end)
    spec[tuple(sl)] = 0.0
    return spec


def melspec_np(wav: np.ndarray, rng=None, training=False) -> np.ndarray:
    """Reference MelSpectrogram.__call__ (transforms.py:158-203): STFT ->
    [stretch] -> power -> mel -> dB -> L2-normalize(freq) -> [masks]."""
    spec = stft_np(wav)
    apply_specaug = training and rng is not None and rng.random() < SPECAUG_P
    if apply_specaug:
        spec = phase_vocoder_np(spec, rng.uniform(STRETCH_MIN, STRETCH_MAX))
    power = np.abs(spec) ** 2
    mel = _MELFB.T @ power  # [M, T']
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    norm = np.sqrt((db * db).sum(axis=0, keepdims=True))
    db = db / np.maximum(norm, 1e-12)
    if apply_specaug:
        db = _mask_along_axis(rng, db, FREQ_MASK_RATIO * db.shape[0], 0)
        db = _mask_along_axis(rng, db, TIME_MASK_RATIO * db.shape[1], 1)
    return db.astype(np.float32)


def build_corpus():
    ds = SyntheticSpeakerDataset(
        n_speakers=N_SPK, utterances_per_speaker=UPS, seed=1234,
        formant_jitter=150.0, noise_level=0.05, reverb_prob=0.5,
        pitch_jitter=0.10, f0_range=(110.0, 200.0),
    )
    train_utt, val_utt, test_utt = ds.get_splits(
        val=True, val_utterances_per_speaker=VAL_UPS,
        test=True, test_speakers=TEST_SPK, test_utterances_per_speaker=TEST_UPS,
    )
    return ds, train_utt, val_utt, test_utt


def _train_batch_tensors(ds, utt_ids, rng):
    """Chunk -> mel per utterance, zero-pad to batch max (datasets.py:48-73
    collation semantics), plus speaker-id targets."""
    mels, spk = [], []
    for u in utt_ids:
        wav, sr, speaker = ds.get_sample(int(u))
        wav = np.asarray(wav, np.float32).reshape(-1)
        if len(wav) / sr > CHUNK_MAX_S:  # RandomChunk, transforms.py:216-233
            n = int(rng.choice(CHUNK_LENGTHS) * sr)
            n = min(n, len(wav))
            start = rng.integers(0, len(wav) - n + 1)
            wav = wav[start:start + n]
        mels.append(melspec_np(wav, rng, training=True))
        spk.append(ds.speakers_to_id[speaker])
    t_max = max(m.shape[1] for m in mels)
    out = np.zeros((len(mels), N_MELS, t_max), np.float32)
    for i, m in enumerate(mels):
        out[i, :, :m.shape[1]] = m
    return torch.from_numpy(out), torch.as_tensor(spk, dtype=torch.long)


@torch.no_grad()
def test_model(model, ds, test_utt):
    """Reference test protocol (learn.py:409-459): eval-mode embeddings of
    full-length un-augmented test utterances, all-pairs cosine, EER/minDCF.
    Embeddings are computed once per utterance (the reference recomputes
    them per pair at B=1 — identical math, quadratically more forwards)."""
    model.eval()
    embs, speakers = [], []
    for u in test_utt:
        wav, sr, speaker = ds.get_sample(int(u))
        mel = melspec_np(np.asarray(wav, np.float32).reshape(-1))
        e = model(torch.from_numpy(mel[None]))
        embs.append(e.squeeze(0).numpy())
        speakers.append(ds.speakers_to_id[speaker])
    scores, labels = all_pairs_scores_labels(np.stack(embs), speakers)
    return get_test_metrics(scores, labels, mindcf_p_target=0.01)


def run_one(loss_name: str, seed: int, epochs: int) -> dict:
    import losses as ref_losses  # /root/reference/src (read-only)
    import models as ref_models

    torch.manual_seed(seed)
    torch.set_num_threads(1)

    ds, train_utt, _val_utt, test_utt = build_corpus()
    loss_kwargs = {"margin": 0.2, "scale": 30} if loss_name == "arc" else {}
    loss_fn = ref_losses.LOSSES[loss_name](EMB, N_SPK, **loss_kwargs)
    model = ref_models.TitaNet.get_titanet(
        embedding_size=EMB, n_mels=N_MELS, n_mega_blocks=17, model_size="s",
        attention_hidden_size=128, loss_function=loss_fn, dropout=0.1,
    )
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.0)

    train_utt = np.asarray(train_utt)
    history = []
    for epoch in range(1, epochs + 1):
        model.train()
        rng = np.random.default_rng((seed, epoch))
        order = rng.permutation(len(train_utt))
        t0, epoch_loss, n_batches = time.time(), 0.0, 0
        for s in range(0, len(order), BATCH):
            ids = train_utt[order[s:s + BATCH]]
            specs, spk = _train_batch_tensors(ds, ids, rng)
            _emb, _preds, loss = model(specs, speakers=spk)
            if not torch.isfinite(loss):
                return {"loss": loss_name, "seed": seed, "epochs": epochs,
                        "diverged": True}
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            epoch_loss += float(loss)
            n_batches += 1
        history.append(epoch_loss / n_batches)
        print(f"[{loss_name} seed{seed}] epoch {epoch}/{epochs} "
              f"loss {history[-1]:.3f} ({time.time() - t0:.0f}s)", flush=True)
    metrics = test_model(model, ds, test_utt)
    print(f"[{loss_name} seed{seed}] test: {metrics}", flush=True)
    return {"loss": loss_name, "seed": seed, "epochs": epochs,
            "eer": metrics["eer"], "mindcf": metrics["mindcf"],
            "train_loss": history}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--runs", default="ce:42,ce:43,ce:44,arc:42,arc:43,arc:44")
    args = ap.parse_args()

    ledger = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = json.load(f)

    for spec in args.runs.split(","):
        loss_name, seed = spec.split(":")
        key = f"ref_torch_{loss_name}_seed{seed}_e{args.epochs}"
        if key in ledger:
            print(f"[skip] {key}: {ledger[key]}", flush=True)
            continue
        ledger[key] = run_one(loss_name, int(seed), args.epochs)
        with open(LEDGER, "w") as f:
            json.dump(ledger, f, indent=2)


if __name__ == "__main__":
    main()
