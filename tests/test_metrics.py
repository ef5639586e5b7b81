"""Metrics vs sklearn/scipy (the reference's implementations)."""

import numpy as np
import pytest
from scipy.interpolate import interp1d
from scipy.optimize import brentq
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
    roc_curve as sk_roc_curve,
)

from titanet_tpu.train.metrics import (
    all_pairs_scores_labels,
    compute_eer,
    compute_mindcf,
    det_curve,
    get_test_metrics,
    get_train_val_metrics,
)


def _reference_eer(scores, labels):
    """The reference's exact EER computation (src/utils.py:294-300)."""
    fpr, tpr, _ = sk_roc_curve(labels, scores)
    return brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)


def _reference_mindcf(scores, labels, p_target=0.01, c_fa=1, c_miss=1, eps=1e-6):
    """The reference's exact minDCF loop (src/utils.py:303-367)."""
    sorted_indexes, _ = zip(
        *sorted(enumerate(scores), key=lambda t: t[1])
    )
    labels_s = [labels[i] for i in sorted_indexes]
    fnrs, fprs = [], []
    for i in range(len(labels_s)):
        if i == 0:
            fnrs.append(labels_s[i])
            fprs.append(1 - labels_s[i])
        else:
            fnrs.append(fnrs[i - 1] + labels_s[i])
            fprs.append(fprs[i - 1] + 1 - labels_s[i])
    fnrs_norm = sum(labels_s)
    fprs_norm = len(labels_s) - fnrs_norm
    fnrs = [x / (float(fnrs_norm) + eps) for x in fnrs]
    fprs = [1 - x / (float(fprs_norm) + eps) for x in fprs]
    min_c_det = float("inf")
    for i in range(len(fnrs)):
        c_det = c_miss * fnrs[i] * p_target + c_fa * fprs[i] * (1 - p_target)
        min_c_det = min(min_c_det, c_det)
    c_def = min(c_miss * p_target, c_fa * (1 - p_target))
    return min_c_det / (c_def + eps)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eer_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 400
    labels = rng.integers(0, 2, n)
    scores = rng.standard_normal(n) * 0.3 + labels * 0.8  # separable-ish
    ours = compute_eer(scores, labels)
    ref = _reference_eer(scores, labels)
    assert abs(ours - ref) < 5e-3, (ours, ref)


@pytest.mark.parametrize("seed", [0, 1])
def test_mindcf_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 300
    labels = rng.integers(0, 2, n).tolist()
    scores = (rng.standard_normal(n) * 0.3 + np.asarray(labels) * 0.8).tolist()
    ours = compute_mindcf(scores, labels)
    ref = _reference_mindcf(scores, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_classification_metrics_match_sklearn():
    rng = np.random.default_rng(3)
    y_true = rng.integers(0, 10, 200)
    y_pred = np.where(rng.random(200) < 0.7, y_true, rng.integers(0, 10, 200))
    ours = get_train_val_metrics(y_true, y_pred, prefix="val")
    assert abs(ours["val/accuracy"] - accuracy_score(y_true, y_pred)) < 1e-12
    assert abs(ours["val/precision"] - precision_score(y_true, y_pred, average="macro", zero_division=0)) < 1e-12
    assert abs(ours["val/recall"] - recall_score(y_true, y_pred, average="macro", zero_division=0)) < 1e-12
    assert abs(ours["val/f1"] - f1_score(y_true, y_pred, average="macro", zero_division=0)) < 1e-12


def test_all_pairs_protocol_matches_reference_shape():
    """Pair protocol: N utterances -> N^2 scored pairs incl. self-pairs
    (reference itertools.product, src/datasets.py:172)."""
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((20, 8))
    spk = np.repeat(np.arange(4), 5)
    scores, labels = all_pairs_scores_labels(emb, spk)
    assert scores.shape == labels.shape == (400,)
    assert labels.sum() == 4 * 25  # 5x5 same-speaker blocks
    # self-pairs score 1.0
    np.testing.assert_allclose(scores.reshape(20, 20).diagonal(), 1.0, rtol=1e-9)
    m = get_test_metrics(scores, labels)
    assert 0 <= m["eer"] <= 1 and m["mindcf"] >= 0


def test_metrics_from_class_counts_matches_list_metrics():
    """Device-side accumulation (train loop fast path) must reproduce
    get_train_val_metrics exactly, including sklearn's label-union macro."""
    import jax
    import jax.numpy as jnp

    from titanet_tpu.train import (
        accumulate_metrics,
        get_train_val_metrics,
        init_metrics_acc,
        metrics_from_class_counts,
    )

    rng = np.random.default_rng(7)
    n_classes = 11  # some classes never appear in preds or targets
    acc = init_metrics_acc(n_classes)
    y_true_all, y_pred_all = [], []
    for step in range(5):
        y_true = rng.integers(0, 7, size=16)
        y_pred = rng.integers(0, 9, size=16)
        y_true_all.extend(y_true.tolist())
        y_pred_all.extend(y_pred.tolist())
        acc = accumulate_metrics(
            acc, jnp.float32(0.5), jnp.asarray(y_pred), jnp.asarray(y_true)
        )
    host = jax.device_get(acc)
    ours = metrics_from_class_counts(
        host.tp, host.pred_count, host.true_count, host.correct,
        host.n_examples, prefix="train",
    )
    ref = get_train_val_metrics(y_true_all, y_pred_all, prefix="train")
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-12, err_msg=k)
    assert float(host.loss_sum) == pytest.approx(2.5)
    assert int(host.steps) == 5
    assert not bool(host.nonfinite)
    # non-finite flag latches
    acc = accumulate_metrics(acc, jnp.float32(np.nan), None, jnp.asarray([0]))
    assert bool(jax.device_get(acc).nonfinite)


def test_snorm_scores_math():
    """S-norm/AS-norm: hand-computed z-statistics on a tiny case."""
    from titanet_tpu.train import snorm_scores

    scores = np.array([[0.8, 0.2]])  # 1 enroll x 2 test
    enroll_cohort = np.array([[0.0, 0.2, 0.4]])  # mu=0.2, sd=std([0,.2,.4])
    test_cohort = np.array([[0.1, 0.3], [0.5, 0.5]])
    sd_e = np.std([0.0, 0.2, 0.4])
    out = snorm_scores(scores, enroll_cohort, test_cohort)
    exp00 = 0.5 * ((0.8 - 0.2) / sd_e + (0.8 - 0.2) / np.std([0.1, 0.3]))
    np.testing.assert_allclose(out[0, 0], exp00, rtol=1e-12)
    # test side with zero-variance cohort: sd clamps to eps -> huge z;
    # just assert finite and ordering preserved within the enroll row's
    # z-term when the test term is shared
    assert np.isfinite(out).all()

    # top-K (AS-norm): with topk=2 the enroll stats use the 2 HIGHEST
    # cohort scores {0.2, 0.4} -> mu=0.3, sd=0.1
    out_topk = snorm_scores(scores, enroll_cohort, test_cohort, topk=2)
    exp_topk00 = 0.5 * ((0.8 - 0.3) / 0.1 + (0.8 - 0.2) / np.std([0.1, 0.3]))
    np.testing.assert_allclose(out_topk[0, 0], exp_topk00, rtol=1e-12)


def test_snorm_removes_per_utterance_offset():
    """The failure mode S-norm exists for: a constant per-utterance score
    offset (channel effect) that raw cosine ranking cannot undo. Simulated
    at the score level: raw EER degrades, S-normed EER recovers."""
    from titanet_tpu.train import compute_eer, snorm_scores

    rng = np.random.default_rng(0)
    n, c = 40, 200
    spk = np.repeat(np.arange(8), 5)
    same = (spk[:, None] == spk[None, :]).astype(float)
    # clean scores: same-speaker ~0.6, different ~0.1, small noise
    clean = 0.1 + 0.5 * same + rng.normal(0, 0.05, (n, n))
    # per-utterance additive offset on both sides (row+col), sd comparable
    # to the margin -> heavy overlap in raw scores
    offset = rng.normal(0, 0.25, n)
    noisy = clean + offset[:, None] + offset[None, :]
    labels = same.reshape(-1).astype(int)
    raw_eer = compute_eer(noisy.reshape(-1), labels)
    # cohort scores carry the same per-utterance offset
    cohort = rng.normal(0.1, 0.05, (n, c)) + offset[:, None]
    normed = snorm_scores(noisy, cohort, cohort)
    snorm_eer = compute_eer(normed.reshape(-1), labels)
    assert snorm_eer < raw_eer - 0.05, (raw_eer, snorm_eer)


def test_all_pairs_with_cohort_runs():
    from titanet_tpu.train import all_pairs_scores_labels

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((12, 8))
    spk = np.repeat(np.arange(3), 4)
    cohort = rng.standard_normal((30, 8))
    s_raw, l_raw = all_pairs_scores_labels(emb, spk)
    s_norm, l_norm = all_pairs_scores_labels(
        emb, spk, cohort_embeddings=cohort, cohort_topk=10
    )
    np.testing.assert_array_equal(l_raw, l_norm)
    assert s_norm.shape == s_raw.shape
    assert not np.allclose(s_norm, s_raw)


def test_det_curve_sweep_matches_scalar_metrics():
    """det_curve's (fpr, fnr) sweep must contain the EER crossing and be
    monotone in opposite directions along ascending thresholds."""
    rng = np.random.default_rng(0)
    scores = np.concatenate([rng.normal(1.0, 1.0, 400),   # target
                             rng.normal(-1.0, 1.0, 1600)])  # nontarget
    labels = np.concatenate([np.ones(400), np.zeros(1600)])
    fprs, fnrs, thr = det_curve(scores, labels)
    assert len(fprs) == len(fnrs) == len(thr) == len(scores)
    assert np.all(np.diff(thr) >= 0)
    # ascending threshold: FNR (misses) grows, FPR (false accepts) shrinks
    assert np.all(np.diff(fnrs) >= -1e-12) and np.all(np.diff(fprs) <= 1e-12)
    eer = compute_eer(scores, labels)
    crossing = np.argmin(np.abs(fnrs - fprs))
    assert abs((fnrs[crossing] + fprs[crossing]) / 2 - eer) < 5e-3


def test_plot_det_curve_writes_png(tmp_path):
    from titanet_tpu.utils.viz import plot_det_curve

    rng = np.random.default_rng(1)
    mk = lambda mu: (
        np.concatenate([rng.normal(mu, 1.0, 100), rng.normal(-mu, 1.0, 300)]),
        np.concatenate([np.ones(100), np.zeros(300)]),
    )
    out = tmp_path / "det.png"
    fig = plot_det_curve({"cosine": mk(1.0), "plda": mk(1.5)}, save=str(out))
    assert fig is not None and out.exists() and out.stat().st_size > 1000
