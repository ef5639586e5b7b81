"""Speaker enrollment/verification/identification registry
(titanet_tpu/train/enroll.py)."""

import numpy as np
import pytest

from titanet_tpu.train.enroll import SpeakerRegistry, registry_from_trials


def _clustered_embeddings(n_speakers=4, k=5, dim=32, spread=0.15, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_speakers, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = {
        f"spk{i}": centers[i] + spread * rng.standard_normal((k, dim))
        for i in range(n_speakers)
    }
    return centers, per


def test_enroll_verify_identify_roundtrip():
    centers, per = _clustered_embeddings()
    reg = SpeakerRegistry(threshold=0.5)
    for name, emb in per.items():
        reg.enroll(name, emb)
    assert reg.speakers == sorted(per)
    # verify: own center accepted, other center rejected
    ok, score = reg.verify("spk0", centers[0])
    assert ok and score > 0.9
    ok, _ = reg.verify("spk0", centers[1])
    assert not ok
    # identify: each center maps to its speaker
    results = reg.identify(centers)
    assert [r[0][0] for r in results] == ["spk0", "spk1", "spk2", "spk3"]
    # open set: an orthogonalized probe is unknown
    probe = np.linalg.svd(centers, full_matrices=True)[2][-1]
    unknown = reg.identify(probe)[0][0]
    assert unknown[0] is None


def test_incremental_enrollment_equals_batch():
    _, per = _clustered_embeddings(seed=1)
    a = SpeakerRegistry()
    b = SpeakerRegistry()
    emb = per["spk0"]
    a.enroll("s", emb)
    for row in emb:
        b.enroll("s", row)
    np.testing.assert_allclose(a.profile("s"), b.profile("s"), atol=1e-12)


def test_save_load_roundtrip(tmp_path):
    from titanet_tpu.train.calibration import LogisticCalibration

    _, per = _clustered_embeddings(seed=2)
    reg = SpeakerRegistry(threshold=0.0,
                          calibration=LogisticCalibration(8.0, -3.0))
    for name, emb in per.items():
        reg.enroll(name, emb)
    path = str(tmp_path / "registry.json")
    reg.save(path)
    loaded = SpeakerRegistry.load(path)
    assert loaded.speakers == reg.speakers
    assert loaded.threshold == 0.0
    assert loaded.calibration.a == 8.0 and loaded.calibration.b == -3.0
    probe = per["spk1"][0]
    np.testing.assert_allclose(
        loaded.verify("spk1", probe)[1], reg.verify("spk1", probe)[1]
    )


def test_registry_from_trials_bayes_threshold():
    rng = np.random.default_rng(3)
    # dev trials: target cosines ~0.8, nontarget ~0.1
    dev_scores = np.concatenate([
        rng.normal(0.8, 0.05, 500), rng.normal(0.1, 0.05, 500)
    ])
    dev_labels = np.concatenate([np.ones(500), np.zeros(500)]).astype(int)
    _, per = _clustered_embeddings(spread=0.05, seed=4)
    reg = registry_from_trials(
        list(per.values()), list(per), dev_scores, dev_labels
    )
    assert reg.threshold == 0.0 and reg.calibration is not None
    # a same-speaker probe scores cosine ~1 -> llr >> 0; cross-speaker ~0 -> llr << 0
    assert reg.verify("spk0", per["spk0"][0])[0]
    assert not reg.verify("spk0", per["spk1"][0])[0]


def test_errors():
    reg = SpeakerRegistry()
    with pytest.raises(ValueError):
        reg.identify(np.zeros(8))
    assert reg.remove("nobody") is False
    reg.enroll("a", np.ones(8))
    assert reg.remove("a") is True and reg.speakers == []
