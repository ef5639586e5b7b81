"""Trial-list verification protocol (titanet_tpu/train/trials.py).

The reference has no trial-file support (its eval is all-pairs on its own
test split, src/learn.py:409-459); these tests pin the added protocol:
parser formats, dedup embedding, cosine/PLDA/S-norm scoring exactness vs
the existing matrix-form primitives, and the end-to-end file -> metrics
path on real (tiny) wav files.
"""

import os

import numpy as np
import pytest

from titanet_tpu.train.trials import (
    embed_trial_files,
    evaluate_trials,
    parse_trial_list,
    trial_scores,
    write_scores,
)


def _write(path, text):
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


# -- parser -------------------------------------------------------------


def test_parse_voxceleb_format(tmp_path):
    p = tmp_path / "veri.txt"
    _write(p, "# comment\n1 a/x.wav b/y.wav\n\n0 a/x.wav c/z.wav\n")
    labels, enrolls, tests = parse_trial_list(str(p))
    np.testing.assert_array_equal(labels, [1, 0])
    assert enrolls == ["a/x.wav", "a/x.wav"]
    assert tests == ["b/y.wav", "c/z.wav"]


def test_parse_kaldi_format(tmp_path):
    p = tmp_path / "trials"
    _write(p, "e1.wav t1.wav target\ne2.wav t2.wav nontarget\n"
              "e3.wav t3.wav IMP\n")
    labels, enrolls, tests = parse_trial_list(str(p))
    np.testing.assert_array_equal(labels, [1, 0, 0])
    assert enrolls[0] == "e1.wav" and tests[2] == "t3.wav"


@pytest.mark.parametrize("bad", [
    "1 only-two-fields\n",
    "e.wav t.wav maybe\n",
    "",
])
def test_parse_rejects_malformed(tmp_path, bad):
    p = tmp_path / "bad.txt"
    _write(p, bad)
    with pytest.raises(ValueError):
        parse_trial_list(str(p))


# -- scoring ------------------------------------------------------------


def _fake_embeddings(n=6, e=8, seed=0):
    rng = np.random.default_rng(seed)
    embs = rng.standard_normal((n, e))
    return {f"u{i}.wav": embs[i] for i in range(n)}


def test_cosine_scores_match_manual():
    emb = _fake_embeddings()
    enrolls = ["u0.wav", "u1.wav", "u0.wav"]
    tests = ["u2.wav", "u3.wav", "u0.wav"]
    s = trial_scores(emb, enrolls, tests)
    for i, (a, b) in enumerate(zip(enrolls, tests)):
        x, y = emb[a], emb[b]
        want = x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
        np.testing.assert_allclose(s[i], want, rtol=1e-12)
    np.testing.assert_allclose(s[2], 1.0, rtol=1e-12)  # self-trial


def test_snorm_matches_matrix_primitive():
    """Pairwise S-norm must equal metrics.snorm_scores on the same pairs."""
    from titanet_tpu.train.metrics import cross_cosine_scores, snorm_scores

    emb = _fake_embeddings(n=5)
    rng = np.random.default_rng(1)
    cohort = rng.standard_normal((16, 8))
    names = list(emb.keys())
    enrolls = [names[0], names[1], names[2]]
    tests = [names[3], names[4], names[3]]
    for topk in (None, 7):
        got = trial_scores(emb, enrolls, tests,
                           cohort_embeddings=cohort, cohort_topk=topk)
        stack = np.stack([emb[n] for n in names])
        full = cross_cosine_scores(stack, stack)
        coh = cross_cosine_scores(stack, cohort)
        mat = snorm_scores(full, coh, coh, topk=topk)
        idx = {n: i for i, n in enumerate(names)}
        want = np.asarray([mat[idx[a], idx[b]]
                           for a, b in zip(enrolls, tests)])
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_plda_backend_matches_llr():
    from titanet_tpu.train.plda import PLDA

    rng = np.random.default_rng(2)
    # 10 speakers x 8 utterances of separable 16-d embeddings
    means = rng.standard_normal((10, 16)) * 3.0
    embs = (means[:, None, :] +
            rng.standard_normal((10, 8, 16))).reshape(-1, 16)
    labels = np.repeat(np.arange(10), 8)
    plda = PLDA.fit(embs, labels)
    emb = {f"u{i}.wav": embs[i] for i in range(6)}
    enrolls, tests = ["u0.wav", "u1.wav"], ["u2.wav", "u5.wav"]
    got = trial_scores(emb, enrolls, tests, backend="plda", plda=plda)
    want = plda.llr(np.stack([embs[0], embs[1]]),
                    np.stack([embs[2], embs[5]]))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_backend_validation():
    emb = _fake_embeddings(n=2)
    with pytest.raises(ValueError):
        trial_scores(emb, ["u0.wav"], ["u1.wav"], backend="euclid")
    with pytest.raises(ValueError):
        trial_scores(emb, ["u0.wav"], ["u1.wav"], backend="plda")


# -- embedding + end-to-end ----------------------------------------------


class _CountingEmbedder:
    """Fake embedder: deterministic per-length embedding, counts calls."""

    def __init__(self):
        self.n_embedded = 0

    def embed(self, wavs):
        self.n_embedded += len(wavs)
        rng = np.random.default_rng(0)
        out = []
        for w in wavs:
            r = np.random.default_rng(len(w))
            out.append(r.standard_normal(8))
        del rng
        return np.stack(out)


def _write_wav(path, n, sr=16000, seed=0):
    import wave

    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(n) * 3000).astype(np.int16)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_embed_trial_files_dedups_and_resolves_root(tmp_path):
    for i in range(3):
        _write_wav(tmp_path / "spk" / f"u{i}.wav", 8000 + 100 * i, seed=i)
    paths = ["spk/u0.wav", "spk/u1.wav", "spk/u0.wav", "spk/u2.wav",
             "spk/u1.wav"]
    emb = _CountingEmbedder()
    out = embed_trial_files(paths, emb, audio_root=str(tmp_path))
    assert emb.n_embedded == 3  # unique files only
    assert set(out) == {"spk/u0.wav", "spk/u1.wav", "spk/u2.wav"}
    assert out["spk/u0.wav"].shape == (8,)


def test_evaluate_trials_end_to_end(tmp_path):
    """Real wavs, real model: two synthetic 'speakers' (distinct band-limited
    noise), DumbConvNet embedder; pipeline must produce finite metrics and a
    parseable scores file with one line per trial."""
    import jax
    import jax.numpy as jnp

    from titanet_tpu.models import DumbConvNet
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from titanet_tpu.train.extractor import SpeakerEmbedder

    rng = np.random.default_rng(3)
    for spk, freq in (("a", 200.0), ("b", 3000.0)):
        t = np.arange(9000) / 16000.0
        for i in range(3):
            wav = np.sin(2 * np.pi * freq * t + i)
            wav += 0.05 * rng.standard_normal(t.size)
            pcm = (wav * 8000).astype(np.int16)
            import wave

            os.makedirs(tmp_path / spk, exist_ok=True)
            with wave.open(str(tmp_path / spk / f"u{i}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
    lines = []
    for spk in ("a", "b"):
        lines.append(f"1 {spk}/u0.wav {spk}/u1.wav")
        lines.append(f"1 {spk}/u0.wav {spk}/u2.wav")
    for i in range(3):
        lines.append(f"0 a/u{i}.wav b/u{i}.wav")
    trial_file = tmp_path / "trials.txt"
    _write(trial_file, "\n".join(lines) + "\n")

    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    cfg = FrontendConfig.from_ms()
    mel0, _ = log_mel_spectrogram(jnp.zeros((1, 16000)), cfg)
    variables = jax.jit(model.init)(jax.random.key(0), mel0)
    embedder = SpeakerEmbedder(
        model, variables["params"], variables.get("batch_stats", {}),
        frontend=cfg, buckets=[16000], batch_size=4,
    )
    scores_out = tmp_path / "scores.txt"
    det_out = tmp_path / "det.png"
    metrics = evaluate_trials(
        str(trial_file), embedder, audio_root=str(tmp_path),
        scores_out=str(scores_out), det_out=str(det_out),
    )
    assert det_out.exists() and det_out.stat().st_size > 1000
    assert metrics["n_trials"] == 7
    assert metrics["n_target"] == 4
    assert metrics["n_files"] == 6
    assert 0.0 <= metrics["eer"] <= 1.0
    assert np.isfinite(metrics["mindcf"]) and np.isfinite(metrics["min_cllr"])
    with open(scores_out) as fh:
        rows = [l.split() for l in fh.read().strip().splitlines()]
    assert len(rows) == 7
    assert all(len(r) == 3 for r in rows)
    float(rows[0][2])  # parseable score


def test_write_scores_roundtrip(tmp_path):
    p = tmp_path / "s.txt"
    write_scores(str(p), ["e.wav"], ["t.wav"], np.asarray([0.25]))
    assert open(p).read() == "e.wav t.wav 0.250000\n"
