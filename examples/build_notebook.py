"""Single source of truth for the demo notebook.

Generates BOTH ``examples/titanet_tpu.ipynb`` (the counterpart of the
reference's 118-cell ``titanet.ipynb``: EDA, per-transform demos, model
inspection, training, pretrained import, embedding visualization) and
``examples/titanet_tpu_notebook.py`` — a straight-line export of every code
cell, so the whole notebook is CI-able (``FAST=1`` shrinks the training
cells; tests run it on the virtual CPU mesh, and it runs as-is on the TPU).

    python examples/build_notebook.py
"""

import json
import os

CELLS = [
    ("md", """\
# titanet_tpu — interactive walkthrough

The notebook-equivalent of the reference's `titanet.ipynb` (118 cells:
Colab bootstrap, LibriSpeech EDA, transform demos, model inspection,
training, pretrained inference + visualization), rebuilt on the TPU-native
stack. Everything below runs without downloaded data (synthetic corpus);
swap in `LibriSpeechDataset("./data")` wherever noted for the real thing.

Sections: 1. EDA · 2. Frontend · 3. Augmentations · 4. Models · 5. Losses ·
6. Training · 7. Discriminative EER benchmark · 8. Pretrained checkpoints ·
9. Embeddings + verification · 10. Multi-chip · 11. Fast serving ·
12. ECAPA-TDNN · 13. Score normalization · 14. Diarization"""),
    ("code", """\
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.getcwd(), "..")))
if os.path.basename(os.getcwd()) != "examples":
    sys.path.insert(0, os.path.abspath(os.getcwd()))
FAST = bool(int(os.environ.get("FAST", "0")))  # FAST=1: CI-scale cells

import jax, jax.numpy as jnp, numpy as np
import matplotlib
matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt
print("devices:", jax.devices())"""),

    # ----------------------------------------------------------------- EDA
    ("md", """\
## 1. Dataset EDA

The `SpeakerDataset` protocol (reference `src/datasets.py:116-294`) exposes
speaker maps, deterministic splits, duration stats and sampling on every
backend — LibriSpeech / VCTK / VoxCeleb1/2 on disk, or the procedural
synthetic corpus (no IO)."""),
    ("code", """\
import os
from titanet_tpu.data import SyntheticSpeakerDataset, LibriSpeechDataset

# availability-gated: the SAME notebook upgrades itself to the real corpus
# on a machine that has it (reference trains on train-clean-100)
if os.path.isdir("./data/LibriSpeech/train-clean-100"):
    ds = LibriSpeechDataset("./data")
    print("using REAL LibriSpeech train-clean-100")
else:
    ds = SyntheticSpeakerDataset(n_speakers=10, utterances_per_speaker=10)
    print("LibriSpeech not found under ./data — using the synthetic corpus")
    # LibriSpeechDataset("./data", download=True) fetches it (~6.3 GB)
ds.info()"""),
    ("code", """\
# duration histogram (reference notebook EDA cells)
durations = list(ds.get_durations().values())
plt.figure(figsize=(8, 3))
plt.hist(durations, bins=30)
plt.xlabel("utterance duration [s]"); plt.ylabel("count"); plt.title("Durations")
plt.show()
print(f"{len(durations)} utterances, {sum(durations)/60:.1f} minutes total")"""),
    ("code", """\
# per-speaker hours + utterance counts
dps = ds.get_durations_per_speaker(hours=False)
ups = {s: len(u) for s, u in ds.speakers_utterances.items()}
fig, axes = plt.subplots(1, 2, figsize=(12, 3))
axes[0].bar([str(s) for s in dps], list(dps.values()))
axes[0].set_title("seconds per speaker")
axes[1].bar([str(s) for s in ups], list(ups.values()))
axes[1].set_title("utterances per speaker")
plt.show()"""),
    ("code", """\
# deterministic splits (reference src/datasets.py:191-229) stay disjoint
train_utt, val_utt, test_utt = ds.get_splits(
    val=True, val_utterances_per_speaker=2,
    test=True, test_speakers=3, test_utterances_per_speaker=2,
)
print(f"train {len(train_utt)} / val {len(val_utt)} / test {len(test_utt)}")
assert not set(train_utt) & set(val_utt)"""),
    ("code", """\
from titanet_tpu.utils.viz import play_audio

ex = ds[0]
print("speaker", ex["speaker"], "| shape", ex["waveform"].shape, "|", ex["sample_rate"], "Hz")
plt.figure(figsize=(10, 2))
plt.plot(ex["waveform"][0][:16000]); plt.title("first second"); plt.show()
play_audio(ex["waveform"], ex["sample_rate"])  # audio widget in Jupyter"""),
    ("md", """\
Verification needs **pairs**: `get_sample_pairs` enumerates the all-pairs
product over a fixed speakers x utterances grid (reference
`src/datasets.py:165-183` — the same protocol `test()` scores), and
`get_random_utterances` drives the per-epoch embedding figures."""),
    ("code", """\
pairs = list(ds.get_sample_pairs(indices=range(0, 60, 10)))  # 6 speakers
print(f"{len(pairs)} pairs over 6 utterances,",
      sum(1 for _, _, same in pairs if same), "same-speaker")
utts, utt_speakers = ds.get_random_utterances(
    n_speakers=4, n_utterances_per_speaker=2, seed=0)
print("random utterance grid:", len(utts), "examples from",
      len(set(utt_speakers)), "speakers")"""),

    # ------------------------------------------------------------ frontend
    ("md", """\
## 2. Audio frontend (on-device)

The reference recomputed torchaudio's CPU `Spectrogram -> MelScale ->
AmplitudeToDB -> normalize` per example per epoch (`src/transforms.py:
111-203`). Here the whole chain is one batched jitted device computation —
gather-free framing, GEMM DFT on the MXU, mel matmul, dB, L2-norm — with
measured 8.9e-6 parity vs torch (PARITY.md)."""),
    ("code", """\
from titanet_tpu.ops.frontend import (
    FrontendConfig, log_mel_spectrogram, mel_filterbank,
)
from titanet_tpu.utils.viz import plot_spectrogram

cfg = FrontendConfig.from_ms()   # 16 kHz, n_fft 512, 25/10 ms, 80 mels
wav = jnp.asarray(ex["waveform"][0])[None, :]
mel, mask = jax.jit(lambda w: log_mel_spectrogram(w, cfg))(wav)
print("mel:", mel.shape, "| frames mask:", None if mask is None else mask.shape)
plot_spectrogram(np.asarray(mel[0]), show=True)"""),
    ("code", """\
# the mel filterbank itself (HTK scale, no area normalization — torchaudio
# defaults, reference src/transforms.py:142-144)
fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
plt.figure(figsize=(10, 3))
plt.imshow(fb.T, aspect="auto", origin="lower")
plt.xlabel("fft bin"); plt.ylabel("mel"); plt.title("mel filterbank"); plt.show()"""),
    ("code", """\
# variable lengths: padded rows equal their solo computation (bit-exact
# reflect at the TRUE right edge), frames beyond 1 + len//hop are zeroed
batch = np.zeros((2, 32000), np.float32)
batch[0] = np.asarray(ex["waveform"][0][:32000])
batch[1, :16000] = np.asarray(ds[1]["waveform"][0][:16000])
mels, fmask = jax.jit(lambda w, l: log_mel_spectrogram(w, cfg, lengths=l))(
    jnp.asarray(batch), jnp.asarray([32000, 16000]))
print("valid frames per row:", fmask.sum(axis=1))"""),

    # ------------------------------------------------------- augmentations
    ("md", """\
## 3. Augmentations

Reference chain (`src/transforms.py`): RandomChunk -> (Reverb) ->
MelSpectrogram with SpecAugment = gated **time stretch** (continuous rate on
the complex spectrogram) + **freq/time masking**. Host-side: chunking, speed
perturbation, RIR reverb. Device-side: the full SpecAugment, fused into the
training step."""),
    ("code", """\
from titanet_tpu.ops.augment import AugmentConfig, log_mel_specaugment, spec_augment

masked = jax.jit(lambda k, m: spec_augment(k, m, probability=1.0))(
    jax.random.key(0), mel)
plot_spectrogram(np.asarray(masked[0]), show=True)  # freq + time masks"""),
    ("code", """\
# time stretch: the reference squares the stretched magnitude immediately,
# so the phase-vocoder phase path cancels — the stretch is exactly a banded
# linear-interp matmul on frame magnitudes (ops/augment.py)
aug = AugmentConfig(min_rate=1.25, max_rate=1.25, probability=1.0,
                    freq_mask_num=0, time_mask_num=0)
stretched, smask = jax.jit(
    lambda k, w: log_mel_specaugment(k, w, cfg, aug,
                                     lengths=jnp.asarray([wav.shape[1]]))
)(jax.random.key(1), wav)
fig, axes = plt.subplots(2, 1, figsize=(10, 5))
axes[0].imshow(np.asarray(mel[0]).T, aspect="auto", origin="lower"); axes[0].set_title("original")
axes[1].imshow(np.asarray(stretched[0]).T, aspect="auto", origin="lower"); axes[1].set_title("stretched 1.25x (tail masked)")
plt.show()
print("valid frames:", int(smask.sum()), "of", stretched.shape[1])"""),
    ("code", """\
from titanet_tpu.ops.augment import resample, reverb, speed_perturb

fast, n_fast = speed_perturb(wav, cfg.sample_rate, 1.05)   # sox-equivalent
slow, n_slow = speed_perturb(wav, cfg.sample_rate, 0.95)
print(f"T={wav.shape[1]} -> 1.05x: {n_fast}, 0.95x: {n_slow}")

rir = jnp.asarray(np.random.default_rng(0).standard_normal(2000).astype(np.float32)
                  * np.exp(-np.arange(2000) / 300).astype(np.float32))
wet = jax.jit(reverb)(wav, rir)
play_audio(np.asarray(wet), cfg.sample_rate)

down = resample(wav, 16000, 8000)        # torchaudio-exact sinc resampler
print("16k -> 8k:", wav.shape, "->", down.shape)"""),
    ("md", """\
Speed perturbation has the reference's two flavors
(`src/transforms.py:78-108`): **discrete** rates with exact polyphase sinc
resampling (kernels cached per rate) and sox-style **continuous** rates
(`SpeedConfig(continuous=True)`, rate ~ U(min, max) per utterance). A 1.05x
speedup shortens the waveform by ~4.8% at the same sample rate:"""),
    ("code", """\
fig, axes = plt.subplots(2, 1, figsize=(10, 4), sharex=True)
seg = np.asarray(wav[0][2000:2400])
seg_fast = np.asarray(fast[0][int(2000/1.05):int(2000/1.05)+400])
axes[0].plot(seg); axes[0].set_title("original (400 samples)")
axes[1].plot(seg_fast); axes[1].set_title("1.05x speed (same span: pitch+tempo shift)")
plt.show()
from titanet_tpu.data import SpeedConfig
print("discrete:", SpeedConfig(enabled=True, rates=(0.95, 1.0, 1.05)))
print("continuous:", SpeedConfig(enabled=True, rates=(0.95, 1.05), continuous=True))"""),
    ("code", """\
# RandomChunk lives in the loader (reference src/transforms.py:206-233):
# utterances over max_length get a random 1.5/2/3 s window
from titanet_tpu.data import ChunkConfig, DataLoader

loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=True), seed=0)
chunked = next(iter(loader))
print("chunked batch:", chunked.waveform.shape,
      "lengths:", sorted(set(chunked.lengths.tolist())))"""),

    # -------------------------------------------------------------- models
    ("md", """\
## 4. Models

Size presets match the paper's parameter targets (S/M/L = 6.4/13.4/25.3 M,
reference `src/models.py:173`); `n_mega_blocks=None` solves for the block
count in closed form (the reference brute-forced 1-19,
`src/models.py:230-260`). Baselines: `DumbConvNet` (smoke tests) and the
`DVectorBaseline` LSTM."""),
    ("md", """\
### Architecture

The encoder is a prolog `ConvBlock(n_mels -> H, k=3)`, N **mega blocks**,
and an epilog `ConvBlock(H -> 1536, k=1)` (reference
`src/models.py:342-472`). Each mega block is 3 depthwise-separable
ConvBlocks (grouped K-tap conv + 1x1 pointwise, BatchNorm, ReLU, dropout)
-> squeeze-excitation (global mean over time -> FC(C/16) -> sigmoid gate),
summed with a 1x1-conv+BN skip, then ReLU+dropout. The decoder pools with
**attentive statistics**: per-frame energies `Linear(1536->128) -> tanh ->
Linear(128->1536)`, softmax over time, weighted mean ++ weighted std
`[B, 3072]`, then BN -> Linear(3072->192) -> BN. TPU layout: channels-last,
pointwise convs are `[B*T, C] @ [C, F]` MXU matmuls, depthwise taps run on
the VPU."""),
    ("code", """\
from titanet_tpu.models import (
    DumbConvNet, DVectorBaseline, count_params, find_n_mega_blocks, get_titanet,
)

for size in "sml":
    m = get_titanet(model_size=size)
    print(f"TitaNet-{size.upper()}: {m.n_mega_blocks:>2} mega blocks, "
          f"{count_params(m)/1e6:6.2f} M params")
print("block search for M:", find_n_mega_blocks(model_size="m"))"""),
    ("code", """\
# the reference brute-forced n_mega_blocks in 1..19 against the paper's
# parameter targets (src/models.py:230-260); params are LINEAR in N, so the
# rebuild solves it in closed form. Sweep to see why 18 is TitaNet-S:
from titanet_tpu.models import TARGET_PARAMS

ns = range(1, 20)
counts = [count_params(get_titanet(model_size="s", n_mega_blocks=n)) / 1e6
          for n in ns]
plt.figure(figsize=(8, 3))
plt.plot(list(ns), counts, marker="o", label="params(N)")
plt.axhline(TARGET_PARAMS["s"], ls="--", c="gray", label="paper target 6.4M")
plt.xlabel("n_mega_blocks"); plt.ylabel("M params"); plt.legend(); plt.show()"""),
    ("code", """\
model_s = get_titanet(model_size="s", n_mega_blocks=17)
v = jax.jit(model_s.init)(jax.random.key(0), jnp.zeros((1, 301, 80)))
emb = jax.jit(lambda v, x: model_s.apply(v, x, train=False))(
    v, jnp.asarray(np.asarray(mel), jnp.float32))
print("mel [B, T, 80] -> embeddings", emb.shape)  # [B, 192]"""),
    ("code", """\
dumb = DumbConvNet(hidden_size=16, embedding_size=32, n_layers=2)
dv = DVectorBaseline()
print("DumbConvNet params:", count_params(dumb))
print("DVectorBaseline params:", f"{count_params(dv)/1e6:.2f} M")"""),

    # -------------------------------------------------------------- losses
    ("md", """\
## 5. Loss zoo

CE plus the unified (m1, m2, m3) angular-margin family — SphereFace /
CosFace / ArcFace — and a vectorized GE2E (the reference's scalar-centroid
bug fixed; `losses/heads.py`). Heads own the classifier weights, embeddings
stay loss-agnostic (reference coupling, `src/models.py:318-339`)."""),
    ("code", """\
from titanet_tpu.losses.heads import build_head

e = jnp.asarray(np.random.default_rng(0).standard_normal((16, 192)), jnp.float32)
spk = jnp.asarray(np.arange(16) % 4, jnp.int32)
for name in ("ce", "sphere", "cos", "arc", "ge2e"):
    head = build_head(name, 192, 4)
    hv = jax.jit(head.init)(jax.random.key(0), e, spk)
    _, preds, loss = jax.jit(head.apply)(hv, e, spk)
    print(f"{name:>6}: loss {float(loss):7.4f}  preds: "
          f"{None if preds is None else np.asarray(preds)[:6]}")"""),

    # ------------------------------------------------------------ training
    ("md", """\
## 6. Training

One fused, donated, jitted step: wav -> on-device frontend + SpecAugment ->
fwd/bwd -> Adam (optionally under a device mesh). The loop accumulates
metrics ON DEVICE — no per-step host sync. Full runs:
`python -m titanet_tpu.cli train -p configs/parameters.yml` (the reference's
YAML loads unchanged)."""),
    ("code", """\
from titanet_tpu.losses.heads import build_head
from titanet_tpu.train import create_train_state, make_optimizer
from titanet_tpu.train.loop import train_one_epoch

n_speakers = ds.get_num_speakers()
model = get_titanet(model_size="s", n_mega_blocks=2 if FAST else 3)
head = build_head("arc", 192, n_speakers, scale=30.0, margin=0.2)
opt = make_optimizer(start_lr=1e-3)
state = create_train_state(jax.random.key(0), model, head, opt,
                           jnp.zeros((2, 151, 80)), n_speakers)
loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=True),
                    transport_dtype="int16", seed=0)
history = []
for epoch in range(1, (2 if FAST else 4)):
    state, metrics, _ = train_one_epoch(
        epoch, 3, state, loader, model=model, head=head, optimizer=opt,
        frontend=cfg, augment=AugmentConfig(probability=0.5), renorm_head=True)
    history.append(metrics)
    print(f"epoch {epoch}: loss {metrics['train/avg_loss']:.3f} "
          f"acc {metrics.get('train/accuracy', float('nan')):.3f}")"""),
    ("code", """\
plt.figure(figsize=(8, 3))
plt.plot([m["train/avg_loss"] for m in history], marker="o", label="train loss")
plt.plot([m.get("train/accuracy", np.nan) for m in history], marker="s", label="train acc")
plt.xlabel("epoch"); plt.legend(); plt.title("smoke training"); plt.show()"""),
    ("md", """\
Checkpoints carry the FULL train state — backbone, head (the reference
dropped head weights, `src/learn.py:188-195`), optimizer moments and the
PRNG key — and **resume** (a capability the reference lacks):"""),
    ("code", """\
import tempfile
from titanet_tpu.train.checkpoint import restore_latest, save_checkpoint

ckpt_dir = tempfile.mkdtemp(prefix="titanet_demo_ckpt_")
save_checkpoint(ckpt_dir, epoch=len(history), state=state)
abstract = jax.tree.map(jnp.zeros_like, jax.device_get(state))
restored, at_epoch = restore_latest(ckpt_dir, abstract)
same = jax.tree.reduce(
    lambda a, x: a and x,
    jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                 jax.device_get(state).params, restored.params), True)
print(f"restored epoch {at_epoch}, params identical: {same}")"""),
    ("md", """\
A **baseline comparison** (the reference trains a d-vector/DumbConvNet
baseline against TitaNet): the smoke-test convnet trains on the same
loader; section 9 scores both on verification."""),
    ("code", """\
base_model = DumbConvNet(hidden_size=32, embedding_size=192, n_layers=2)
base_head = build_head("ce", 192, n_speakers)
base_state = create_train_state(jax.random.key(2), base_model, base_head,
                                opt, jnp.zeros((2, 151, 80)), n_speakers)
for epoch in range(1, (2 if FAST else 4)):
    base_state, bmetrics, _ = train_one_epoch(
        epoch, 3, base_state, loader, model=base_model, head=base_head,
        optimizer=opt, frontend=cfg)
print(f"baseline final loss {bmetrics['train/avg_loss']:.3f} "
      f"acc {bmetrics.get('train/accuracy', float('nan')):.3f}")"""),
    ("code", """\
# Karpathy-recipe gradient-leakage check (reference chart_dependencies,
# src/utils.py:451-468): one batch element's loss must not receive
# gradient from other elements
from titanet_tpu.utils import chart_dependencies

chart_dependencies(model,
                   {"params": state.params["backbone"],
                    "batch_stats": state.batch_stats})
print("batch independence: ok")"""),

    # ------------------------------------------------- EER benchmark corpus
    ("md", """\
## 7. Discriminative EER benchmark

The easy corpus saturates (EER 0.0 — a ceiling that can't catch
regressions). The HARD synthetic corpus draws speakers as small offsets
around shared formant centers with overlapping pitch, additive noise and
per-utterance reverb — smoke-scale training lands at a nonzero, stable EER
(see `configs/bench5_hard_synth_eer.yml` and `docs/eer_bench/`)."""),
    ("code", """\
hard = SyntheticSpeakerDataset(
    n_speakers=16 if FAST else 64, utterances_per_speaker=6,
    formant_jitter=150.0, noise_level=0.05, reverb_prob=0.5,
    pitch_jitter=0.10, f0_range=(110.0, 200.0), seed=1234)
print(hard.info())
plot_spectrogram(np.asarray(
    jax.jit(lambda w: log_mel_spectrogram(w, cfg))(
        jnp.asarray(hard[0]["waveform"]))[0][0]), show=True)"""),

    # -------------------------------------------------------- checkpoints
    ("md", """\
## 8. Pretrained reference checkpoints

Reference `.pth` files convert directly — conv/BN/linear/LSTM weights are
transposed into channels-last flax trees, and classifier heads migrate from
the `loss_function.*` keys (reference checkpoints are embeddings-only,
`src/learn.py:188-195`)."""),
    ("code", """\
from titanet_tpu.utils.torch_compat import load_reference_checkpoint

ckpt = "pretrained/titanet-s-arc-100e.pth"
if os.path.exists(ckpt):
    params, batch_stats = load_reference_checkpoint(ckpt)
    print("imported:", jax.tree.reduce(lambda a, x: a + x.size, params, 0), "params")
else:
    print(f"({ckpt} not present — drop the reference's pretrained files in ./pretrained)")"""),

    # ---------------------------------------------- embeddings/verification
    ("md", """\
## 9. Embedding extraction, visualization, verification

Batched + bucketed + masked: padded rows produce the same embedding as solo
forwards, so EVERY utterance embeds once and all pairs score in one
`[N, E] @ [E, N]` matmul (the reference ran 2N² batch-1 forwards,
`src/learn.py:429-439`)."""),
    ("code", """\
from titanet_tpu.train.extractor import SpeakerEmbedder
from titanet_tpu.train.metrics import all_pairs_scores_labels, get_test_metrics
from titanet_tpu.utils.viz import visualize_embeddings

emb = SpeakerEmbedder(model, state.params["backbone"], state.batch_stats,
                      frontend=cfg, buckets=[24000, 48000], batch_size=16)
wavs = [ds[i]["waveform"][0] for i in range(len(ds))]
speakers = [ds[i]["speaker_id"] for i in range(len(ds))]
vectors = emb.embed(wavs)
print("embeddings:", vectors.shape)"""),
    ("code", """\
visualize_embeddings(vectors, speakers, reduction_method="svd", show=True)
if not FAST:
    visualize_embeddings(vectors, speakers, reduction_method="tsne", show=True)"""),
    ("code", """\
scores, labels = all_pairs_scores_labels(vectors, speakers)
get_test_metrics(scores, labels, prefix="demo")"""),
    ("md", """\
Genuine vs impostor **score distributions** — the gap between the two
histograms is what EER/minDCF quantify — and the reference's
baseline-vs-TitaNet comparison on the same protocol:"""),
    ("code", """\
plt.figure(figsize=(8, 3))
plt.hist(scores[labels == 1], bins=40, alpha=0.6, density=True, label="genuine")
plt.hist(scores[labels == 0], bins=40, alpha=0.6, density=True, label="impostor")
plt.xlabel("cosine score"); plt.legend(); plt.title("verification scores"); plt.show()"""),
    ("code", """\
base_emb = SpeakerEmbedder(base_model, base_state.params["backbone"],
                           base_state.batch_stats, frontend=cfg,
                           buckets=[24000, 48000], batch_size=16)
base_vectors = base_emb.embed(wavs)
b_scores, b_labels = all_pairs_scores_labels(base_vectors, speakers)
print("baseline:", get_test_metrics(b_scores, b_labels, prefix="base"))
print("titanet :", get_test_metrics(scores, labels, prefix="titanet"))"""),
    ("md", """\
**Cross-corpus generalization** (the reference's VCTK section: embed a
corpus the model never trained on): availability-gated — with VCTK 0.92 on
disk this embeds REAL held-out speakers (exactly the reference's cells
95-118); otherwise the HARD synthetic corpus' held-out speakers stand in.
Clusters degrade but survive, and you can hear/see why with the earlier
EDA tools."""),
    ("code", """\
import os
from titanet_tpu.data import VCTKDataset

if os.path.isdir("./data/wav48_silence_trimmed"):
    xds = VCTKDataset("./data")   # real VCTK — reference visualization corpus
    print("using REAL VCTK 0.92")
else:
    xds = hard
    print("VCTK not found under ./data — using the hard synthetic corpus")
    # VCTKDataset("./data", download=True) fetches it (~11 GB)
hard_wavs = [xds[i]["waveform"][0] for i in range(0, min(len(xds), 60))]
hard_speakers = [xds[i]["speaker_id"] for i in range(0, min(len(xds), 60))]
hard_vectors = emb.embed(hard_wavs)
visualize_embeddings(hard_vectors, hard_speakers, reduction_method="svd", show=True)
h_scores, h_labels = all_pairs_scores_labels(hard_vectors, hard_speakers)
print("cross-corpus:", get_test_metrics(h_scores, h_labels, prefix="xcorpus"))"""),

    # ----------------------------------------------------------- multichip
    ("md", """\
## 10. Multi-chip

The SAME train step runs over an N-device `jax.sharding.Mesh`: batch sharded
on the data axis, state replicated, gradient all-reduce + global-batch
SyncBN inserted by XLA (`titanet_tpu/parallel/`). Without N real chips,
validate on a virtual CPU mesh:

```bash
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
python -c "import __graft_entry__ as g; g._dryrun_body(8)"
```

(`__graft_entry__.dryrun_multichip(8)` self-provisions exactly that.)
Serving/export: `examples/serve.py`, `tests/test_export.py`."""),

    # ------------------------------------------------- fast serving paths
    ("md", """\
## 11. Fast serving paths

Two TPU-only speed levers beyond the bf16 flax path (both parity-tested;
numbers in BENCHMARKS.md):

- **Fused Pallas frontend** — framing, DFT, power, mel, dB, L2-norm in ONE
  kernel; frames and spectrum never touch HBM
  (`FrontendConfig(use_pallas_fused=True)`).
- **Int8 quantized encoder** — per-channel int8 weights (BN folded in),
  dynamic per-row int8 activations, int8 MXU matmuls
  (`titanet_tpu.models.quantized`)."""),

    ("code", """\
from titanet_tpu.models import l2_normalize, quantize_titanet, titanet_apply_quantized

trained = {"params": state.params["backbone"], "batch_stats": state.batch_stats}
mel_batch = jnp.asarray(
    np.random.default_rng(0).standard_normal((8, 151, 80)), jnp.float32)
qtree = jax.jit(lambda v: quantize_titanet(model, v))(trained)
emb_int8 = jax.jit(titanet_apply_quantized)(qtree, mel_batch)
emb_f32 = jax.jit(lambda v, x: model.apply(v, x, train=False))(trained, mel_batch)
cos = (l2_normalize(emb_int8) * l2_normalize(emb_f32)).sum(-1)
print("int8 vs f32 embedding cosine (min):", float(np.asarray(cos).min()))"""),

    # ----------------------------------------- second model family: ECAPA
    ("md", """\
## 12. The model zoo beyond the reference

The reference ships TitaNet + a d-vector baseline. This package adds the
four other canonical speaker-embedder archetypes, all built from the
shared op set so every step/loop/CLI path drives them unchanged:

- **ECAPA-TDNN** (arXiv:2005.07143, `ecapa: {enabled: true}`):
  SE-Res2Blocks + MFA + channel-context attentive pooling; C=512 is 6.2M
  params and trains ~1.5x FASTER than TitaNet-S on TPU (BENCHMARKS.md);
  hard-corpus band bench13.
- **x-vector** (Snyder 2018, `xvector: {enabled: true}`): the classic
  dilated TDNN — 3.9x TitaNet-S train throughput at ~1 EER point cost
  (bench14); the speed end of the frontier.
- **ResNet34 r-vector** (arXiv:1910.12592, `resnet: {enabled: true}`):
  2D convs over the mel map as an image; the quality-oriented family
  (bench15), ~4x TitaNet-S FLOPs.
- **MFA-Conformer** (arXiv:2203.15249, `conformer: {enabled: true}`):
  the attention archetype — Conformer blocks with Transformer-XL
  relative-position MHSA (gather-free skew) + multi-layer feature
  aggregation; ~20M params at paper scale (bench18)."""),
    ("code", """\
from titanet_tpu.models import (get_conformer, get_ecapa, get_resnet,
                                get_xvector)

ecapa = get_ecapa(channels=128 if FAST else 256)
e_state = create_train_state(jax.random.key(3), ecapa, head, opt,
                             jnp.zeros((2, 151, 80)), n_speakers)
e_state, e_metrics, _ = train_one_epoch(
    1, 1, e_state, loader, model=ecapa, head=head, optimizer=opt,
    frontend=cfg, augment=AugmentConfig(probability=0.5), renorm_head=True)
print("ecapa epoch-1:", {k: round(v, 3) for k, v in e_metrics.items()
                         if k in ("train/avg_loss", "train/accuracy")})"""),
    ("code", """\
# the whole zoo answers the same (mel -> [B, E]) contract
for name, m in [("xvector", get_xvector(hidden_size=64, frame_out=128)),
                ("resnet18", get_resnet(depth=18, base_channels=8)),
                ("conformer", get_conformer(num_blocks=2, dim=64,
                                            ff_hidden=128))]:
    vz = jax.jit(m.init)(jax.random.key(0), jnp.zeros((2, 151, 80)))
    nz = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vz["params"]))
    ez = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        vz, jnp.asarray(np.random.default_rng(0).standard_normal((2, 151, 80)),
                        jnp.float32))
    print(f"{name}: {nz/1e6:.2f}M params (demo scale), emb {ez.shape}")"""),

    # ------------------------------------------------- score normalization
    ("md", """\
## 13. Score normalization (S-norm / AS-norm)

Production verification calibrates trial scores against an impostor
cohort (z-normalizing both sides) — it removes per-utterance offsets
(channel/duration effects) that raw cosine scoring can't. Enable with
`test: {score_norm: asnorm}`; measured EER deltas on the hard corpus are
in docs/eer_bench/SNORM.md."""),
    ("code", """\
from titanet_tpu.train.metrics import cross_cosine_scores, snorm_scores

cohort_vectors = emb.embed([ds[i]["waveform"][0] for i in range(30)])
sq = scores.reshape(len(speakers), len(speakers))
cohort_scores = cross_cosine_scores(vectors, cohort_vectors)
asnorm = snorm_scores(sq, cohort_scores, cohort_scores, topk=20).reshape(-1)
print("raw   :", get_test_metrics(scores, labels))
print("asnorm:", get_test_metrics(asnorm, labels))"""),

    # --------------------------------------------------------- diarization
    ("md", """\
## 14. Speaker diarization (who spoke when)

The production companion of a speaker-embedding model: sliding windows ->
batched embeddings (`SpeakerEmbedder`) -> NME-SC spectral clustering
(auto speaker count via the normalized-maximum-eigengap ratio,
arXiv:1909.01008) -> merged segments, scored with frame-based DER
(Hungarian label mapping, overlap-capable). `python -m titanet_tpu
diarize --audio f.wav --rttm out.rttm` is the CLI version with NIST RTTM
output; `vad=True` adds energy voice-activity detection;
`overlap_threshold=` emits overlapped second speakers (calibrate with
`calibrate_overlap_threshold` — measured honestly null with this
embedding-geometry detector, docs/diarize_bench/DER.md)."""),
    ("code", """\
from titanet_tpu.train.diarize import diarization_error_rate, diarize

# build a conversation: 2 utterances from each of 3 speakers, shuffled
spk_ids = sorted(set(speakers))[:3]
turns, reference, t_cursor = [], [], 0.0
rng = np.random.default_rng(0)
order = [(s, u) for u in range(2) for s in spk_ids]
rng.shuffle(order)
for s, u in order:
    idx = [i for i in range(len(ds)) if ds[i]["speaker_id"] == s][u]
    w = np.asarray(ds[idx]["waveform"], np.float32).reshape(-1)
    turns.append(w)
    reference.append((t_cursor, t_cursor + len(w) / 16000, s))
    t_cursor += len(w) / 16000
conversation = np.concatenate(turns)
segments = diarize(conversation, 16000, emb, window_s=1.5, hop_s=0.75,
                   max_speakers=6)
for s in segments:
    print(f"{s.start:6.2f}s - {s.end:6.2f}s  speaker {s.speaker}")
print("found", len({s.speaker for s in segments}), "speakers (true: 3);",
      "DER", round(diarization_error_rate(reference, segments), 3))"""),
]


def build(out_dir: str = None):
    out_dir = out_dir or os.path.dirname(os.path.abspath(__file__))
    nb = {
        "cells": [],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    lines = [
        '"""Straight-line export of examples/titanet_tpu.ipynb (generated by',
        'build_notebook.py — edit CELLS there, not this file). FAST=1 shrinks',
        'the training cells for CI; runs on the TPU or the virtual CPU mesh."""',
        "",
    ]
    for kind, text in CELLS:
        cell_type = "markdown" if kind == "md" else "code"
        cell = {
            "cell_type": cell_type,
            "metadata": {},
            "source": text.splitlines(keepends=True),
        }
        if cell_type == "code":
            cell["outputs"] = []
            cell["execution_count"] = None
            lines.append("# %% " + "-" * 60)
            lines.append(text)
            lines.append("")
        nb["cells"].append(cell)
    with open(os.path.join(out_dir, "titanet_tpu.ipynb"), "w") as f:
        json.dump(nb, f, indent=1)
    with open(os.path.join(out_dir, "titanet_tpu_notebook.py"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {len(nb['cells'])} cells -> titanet_tpu.ipynb, "
          "titanet_tpu_notebook.py")


if __name__ == "__main__":
    build()
