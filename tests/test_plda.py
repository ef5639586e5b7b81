"""Two-covariance PLDA (titanet_tpu/train/plda.py): generative recovery,
scoring consistency, and the discriminative property it exists for
(downweighting high-variance nuisance directions that defeat cosine)."""

import numpy as np

from titanet_tpu.train.metrics import compute_eer
from titanet_tpu.train.plda import PLDA, length_norm


def _sample(n_speakers, per, between_std, within_std, dim, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal((n_speakers, dim)) * between_std
    x = np.repeat(y, per, axis=0) + rng.standard_normal(
        (n_speakers * per, dim)
    ) * within_std
    spk = np.repeat(np.arange(n_speakers), per)
    return x, spk


def _pair_scores_labels(scores, spk):
    labels = (np.asarray(spk)[:, None] == np.asarray(spk)[None, :])
    iu = np.triu_indices(len(spk), k=1)
    return scores[iu], labels[iu].astype(int)


def test_length_norm():
    x = np.random.default_rng(0).standard_normal((5, 16)) * 3.0
    n = length_norm(x)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), np.sqrt(16), rtol=1e-12)


def test_scoring_consistency():
    x, spk = _sample(6, 5, 1.0, 0.5, 12)
    plda = PLDA.fit(x, spk, n_iter=5)
    s = plda.score_pairs(x)
    # symmetric in its arguments
    np.testing.assert_allclose(s, plda.score_pairs(x, x).T, rtol=1e-10)
    # elementwise llr matches the matrix
    np.testing.assert_allclose(plda.llr(x[:3], x[3:6]),
                               plda.score_pairs(x[:3], x[3:6]).diagonal(),
                               rtol=1e-10)
    # same-speaker pairs score higher on average than different-speaker
    ps, labels = _pair_scores_labels(s, spk)
    assert ps[labels == 1].mean() > ps[labels == 0].mean()


def test_generative_recovery_near_perfect_eer():
    """Data drawn FROM the PLDA model: fitted scorer must verify nearly
    perfectly at this separation."""
    x, spk = _sample(30, 10, 1.0, 0.3, 24, seed=1)
    plda = PLDA.fit(x[:200], spk[:200])
    held_x, held_spk = x[200:], spk[200:]
    s = plda.score_pairs(held_x)
    ps, labels = _pair_scores_labels(s, held_spk)
    assert compute_eer(ps, labels) < 0.05


def test_plda_beats_cosine_under_nuisance_noise():
    """The failure mode PLDA exists for: nuisance directions with LARGE
    within-speaker variance and no speaker information. Cosine weighs them
    like every other direction; PLDA learns psi~0 there and ignores them."""
    rng = np.random.default_rng(2)
    n_spk, per, d_spk, d_noise = 24, 12, 6, 26
    y = rng.standard_normal((n_spk, d_spk))
    speaker_part = np.repeat(y, per, axis=0) + 0.25 * rng.standard_normal(
        (n_spk * per, d_spk)
    )
    noise_part = 2.0 * rng.standard_normal((n_spk * per, d_noise))
    x = np.concatenate([speaker_part, noise_part], axis=1)
    spk = np.repeat(np.arange(n_spk), per)
    train = slice(0, n_spk * per // 2)
    test = slice(n_spk * per // 2, None)

    plda = PLDA.fit(x[train], spk[train])
    s_plda = plda.score_pairs(x[test])
    ps_p, labels = _pair_scores_labels(s_plda, spk[test])

    xn = x[test] / np.linalg.norm(x[test], axis=1, keepdims=True)
    s_cos = xn @ xn.T
    ps_c, _ = _pair_scores_labels(s_cos, spk[test])

    eer_plda = compute_eer(ps_p, labels)
    eer_cos = compute_eer(ps_c, labels)
    assert eer_plda < eer_cos - 0.05, (eer_plda, eer_cos)
    assert eer_plda < 0.10


def test_rank_truncation_zeroes_weak_directions():
    x, spk = _sample(6, 8, 1.0, 0.5, 20, seed=3)
    plda = PLDA.fit(x, spk, rank=5)  # B rank <= 5 with 6 speakers
    assert np.sum(plda.psi > 0) <= 5
    # scoring still works and same > different on average
    s = plda.score_pairs(x)
    ps, labels = _pair_scores_labels(s, spk)
    assert ps[labels == 1].mean() > ps[labels == 0].mean()
