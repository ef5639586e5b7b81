"""Knowledge distillation: train_step teacher term + CLI teacher loading."""

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.losses.heads import build_head
from titanet_tpu.models import get_xvector
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.train import create_train_state, make_optimizer
from titanet_tpu.train.state import train_step


def _setup(seed=0):
    model = get_xvector(hidden_size=32, frame_out=64)
    head = build_head("ce", 192, 4)
    opt = make_optimizer(start_lr=1e-3)
    frontend = FrontendConfig.from_ms()
    state = create_train_state(
        jax.random.key(seed), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    rng = np.random.default_rng(seed + 1)
    wav = jnp.asarray(rng.standard_normal((4, 16000)) * 0.1, jnp.float32)
    spk = jnp.asarray(rng.integers(0, 4, 4), jnp.int32)
    return model, head, opt, frontend, state, wav, spk


def _teacher(seed=9):
    t_model = get_xvector(hidden_size=16, frame_out=32)
    t_vars = jax.jit(t_model.init)(jax.random.key(seed), jnp.zeros((2, 101, 80)))
    return t_model, {"params": t_vars["params"],
                     "batch_stats": t_vars.get("batch_stats", {})}


def test_alpha_zero_equals_plain():
    model, head, opt, frontend, state, wav, spk = _setup()
    snap = jax.tree.map(jnp.array, state)
    t_model, t_vars = _teacher()
    kw = dict(model=model, head=head, optimizer=opt, frontend=frontend)
    _, m_plain = train_step(snap, wav, None, spk, **kw)
    _, m_distill = train_step(
        state, wav, None, spk, teacher_model=t_model,
        teacher_variables=t_vars, distill_alpha=0.0, **kw,
    )
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_distill["loss"]), rtol=1e-6
    )


def test_alpha_one_ignores_labels():
    # with alpha=1 the head loss has zero weight: relabeling the batch must
    # not change the loss (it is purely teacher-embedding cosine distance)
    model, head, opt, frontend, state, wav, _ = _setup(seed=2)
    snap = jax.tree.map(jnp.array, state)
    t_model, t_vars = _teacher()
    kw = dict(model=model, head=head, optimizer=opt, frontend=frontend,
              teacher_model=t_model, teacher_variables=t_vars,
              distill_alpha=1.0)
    _, m_a = train_step(snap, wav, None, jnp.zeros((4,), jnp.int32), **kw)
    _, m_b = train_step(state, wav, None, jnp.arange(4, dtype=jnp.int32), **kw)
    la, lb = float(m_a["loss"]), float(m_b["loss"])
    np.testing.assert_allclose(la, lb, rtol=1e-6)
    assert 0.0 <= la <= 2.0  # mean(1 - cos) range


def test_distilled_student_moves_toward_teacher():
    # several distill-only steps must reduce the student->teacher cosine
    # distance (gradients flow through the student only)
    from titanet_tpu.models import l2_normalize
    from titanet_tpu.train.state import embed_step

    model, head, opt, frontend, state, wav, spk = _setup(seed=3)
    t_model, t_vars = _teacher(seed=11)
    lengths = jnp.full((4,), 16000, jnp.int32)

    def cos_to_teacher(st):
        s = embed_step(st.params["backbone"], st.batch_stats, wav, lengths,
                       model=model, frontend=frontend)
        mel_t = None
        from titanet_tpu.ops.frontend import log_mel_spectrogram

        mel, _ = jax.jit(
            lambda w: log_mel_spectrogram(w, frontend)
        )(wav)
        t = jax.jit(
            lambda v, x: l2_normalize(t_model.apply(v, x, train=False))
        )(t_vars, mel)
        return float(jnp.mean(jnp.sum(s * t, axis=-1)))

    before = cos_to_teacher(state)
    kw = dict(model=model, head=head, optimizer=opt, frontend=frontend,
              teacher_model=t_model, teacher_variables=t_vars,
              distill_alpha=1.0)
    for _ in range(8):
        state, m = train_step(state, wav, None, spk, **kw)
    after = cos_to_teacher(state)
    assert np.isfinite(float(m["loss"]))
    assert after > before, (before, after)


def test_cli_load_teacher_roundtrip(tmp_path):
    from titanet_tpu.cli import _load_teacher, _rebuild_state
    from titanet_tpu.config import Config
    from titanet_tpu.train import checkpoint as ckpt

    base = {
        "audio": {"spectrogram": {"n_mels": 80}},
        "xvector": {"enabled": True, "hidden_size": 32, "frame_out": 64},
        "training": {"run_name": "t"},
    }
    tdir = str(tmp_path / "teacher_run")
    # save a teacher checkpoint with the teacher's own (default-family) arch
    teacher_cfg = Config.from_dict({**base, "xvector": {"enabled": False},
                                    "titanet": {"model_size": "s",
                                                "n_mega_blocks": 2}})
    _, _, _, t_state = _rebuild_state(teacher_cfg, n_speakers=4)
    ckpt.save_checkpoint(tdir, 1, t_state)

    cfg = Config.from_dict({
        **base,
        "titanet": {"model_size": "s", "n_mega_blocks": 2},
        "distill": {
            "enabled": True,
            "teacher_checkpoint": tdir,
            "teacher_overrides": {"xvector.enabled": False},
            "alpha": 0.3,
        },
    })
    teacher = _load_teacher(cfg, n_speakers=4)
    assert teacher is not None
    t_model, t_vars, alpha = teacher
    assert alpha == 0.3
    assert t_model.__class__.__name__ == "TitaNet"
    assert "params" in t_vars and "batch_stats" in t_vars
    # disabled -> None
    cfg_off = Config.from_dict(base)
    assert _load_teacher(cfg_off, n_speakers=4) is None
