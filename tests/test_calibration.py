"""Score calibration: logistic LLR fit, Cllr/minCllr, actual DCF
(titanet_tpu/train/calibration.py)."""

import numpy as np
import pytest

from titanet_tpu.train.calibration import (
    LogisticCalibration,
    actual_dcf,
    cllr,
    min_cllr,
    pav_llrs,
    pav_posteriors,
)


def _gaussian_trials(n=4000, mu=1.0, sigma=1.0, seed=0):
    """Scores where the TRUE llr is analytic: s_tar ~ N(mu, s2),
    s_non ~ N(-mu, s2) -> llr(s) = 2*mu*s/s2."""
    rng = np.random.default_rng(seed)
    tar = rng.normal(mu, sigma, n)
    non = rng.normal(-mu, sigma, n)
    scores = np.concatenate([tar, non])
    labels = np.concatenate([np.ones(n), np.zeros(n)]).astype(int)
    return scores, labels


def test_logistic_fit_recovers_true_llr_slope():
    scores, labels = _gaussian_trials(mu=1.0, sigma=1.0)
    cal = LogisticCalibration.fit(scores, labels)
    assert abs(cal.a - 2.0) < 0.15  # true slope 2*mu/sigma^2 = 2
    assert abs(cal.b) < 0.15  # symmetric classes -> zero offset


def test_cllr_calibrated_beats_miscalibrated():
    scores, labels = _gaussian_trials()
    cal = LogisticCalibration.fit(scores, labels)
    c_cal = cllr(cal(scores), labels)
    c_raw = cllr(scores * 40.0, labels)  # wildly overconfident "llrs"
    assert c_cal < c_raw
    # calibrated Cllr approaches the PAV floor
    assert c_cal <= min_cllr(scores, labels) + 0.02
    assert c_cal < 1.0  # informative


def test_pav_monotone_and_optimal():
    scores, labels = _gaussian_trials(n=800, seed=1)
    post = pav_posteriors(scores, labels)
    order = np.argsort(scores)
    diffs = np.diff(post[order])
    assert np.all(diffs >= -1e-12)  # isotonic
    # PAV llrs are a monotone transform -> same EER ranking; minCllr is a
    # lower bound for ANY affine calibration
    llrs = pav_llrs(scores, labels)
    for a, b in [(1.0, 0.0), (2.0, 0.5), (0.3, -1.0)]:
        assert cllr(llrs, labels) <= cllr(a * scores + b, labels) + 1e-9


def test_actual_dcf_bounds():
    scores, labels = _gaussian_trials(mu=3.0, sigma=0.5, seed=2)
    cal = LogisticCalibration.fit(scores, labels)
    llrs = cal(scores)
    act = actual_dcf(llrs, labels, p_target=0.01)
    assert 0.0 <= act < 0.5  # near-separable classes -> low cost
    # an uninformative system thresholded at Bayes: accepts nothing ->
    # cost = normalized miss cost = p_t*c_miss / min(...) = 1.0
    act0 = actual_dcf(np.zeros_like(llrs), labels, p_target=0.01)
    assert abs(act0 - 1.0) < 1e-9


def test_degenerate_inputs_raise():
    with pytest.raises(AssertionError):
        cllr(np.zeros(4), np.ones(4))  # single-class trials
    with pytest.raises(AssertionError):
        LogisticCalibration.fit(np.zeros(4), np.zeros(4))


def test_run_verification_reports_calibration_metrics():
    """End-to-end: calibrate=True adds cllr/min_cllr/act_dcf to test
    metrics, fitted on the cohort's own trials."""
    import jax
    import jax.numpy as jnp

    from titanet_tpu.data import (
        ChunkConfig, DataLoader, Subset, SyntheticSpeakerDataset,
    )
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_xvector
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.loop import run_verification

    ds = SyntheticSpeakerDataset(n_speakers=6, utterances_per_speaker=6)
    test_loader = DataLoader(
        ds, batch_size=6, shuffle=False, drop_last=False,
        chunk=ChunkConfig(enabled=False), prefetch=0,
    )
    cohort_loader = DataLoader(
        Subset(ds, list(range(12))), batch_size=6, shuffle=False,
        drop_last=False, chunk=ChunkConfig(enabled=False), prefetch=0,
    )
    model = get_xvector(hidden_size=32, frame_out=64)
    head = build_head("ce", 192, 6)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 6
    )
    metrics = run_verification(
        state, test_loader, model=model, frontend=FrontendConfig.from_ms(),
        cohort_loader=cohort_loader, calibrate=True,
    )
    for k in ("test/cllr", "test/min_cllr", "test/act_dcf"):
        assert k in metrics and np.isfinite(metrics[k]), k
    assert metrics["test/min_cllr"] <= metrics["test/cllr"] + 1e-6
    with pytest.raises(ValueError):
        run_verification(
            state, test_loader, model=model,
            frontend=FrontendConfig.from_ms(), calibrate=True,
        )
