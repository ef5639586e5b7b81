"""Observability utilities: JSONL sink, step timer, console logger, viz,
profiling helpers, GE2E (no-classifier) loop path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.utils.logging import ConsoleLogger, JsonlLogger, StepTimer
from titanet_tpu.utils.viz import reduce, visualize_embeddings


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = JsonlLogger(path)
    log.log({"train/loss": 1.5, "train/accuracy": 0.5}, step=1)
    log.log({"val/loss": np.float32(1.2)}, step=2)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["epoch"] == 1 and lines[0]["train/loss"] == 1.5
    assert abs(lines[1]["val/loss"] - 1.2) < 1e-6
    # disabled sink is a no-op
    JsonlLogger(None).log({"x": 1})


def test_step_timer():
    import time

    t = StepTimer()
    t.start("data")
    time.sleep(0.01)
    t.start("model")
    time.sleep(0.02)
    t.start("data")
    time.sleep(0.01)
    t.stop()
    m = t.epoch_metrics("train")
    assert m["train/total_data_time"] >= 0.015
    assert m["train/total_model_time"] >= 0.015
    assert m["train/avg_data_time"] <= m["train/total_data_time"]


def test_console_logger_smoke(capsys):
    c = ConsoleLogger(enabled=True)
    c.log_step("train", 1, 10, 2, 5, 0.5, {"model": 0.01})
    c.log_epoch("val", 1, 10, {"val/loss": 1.0, "val/accuracy": 0.9})
    out = capsys.readouterr().out
    assert "LOSS" in out and "ACCURACY" in out


def test_reduce_and_visualize(tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((40, 16))
    labels = np.repeat(np.arange(4), 10)
    r = reduce(emb, 2, "svd")
    assert r.shape == (40, 2)
    r = reduce(emb, 2, "umap")  # falls back to svd without umap package
    assert r.shape == (40, 2)
    path = visualize_embeddings(
        emb, labels, reduction_method="svd", convex_hull=True,
        remove_outliers=True, legend=True,
        save=str(tmp_path / "viz.png"),
    )
    assert os.path.exists(path)


def test_profiling_helpers():
    from titanet_tpu.utils.profiling import StepProfiler, annotate, device_memory_stats

    p = StepProfiler()
    x = jnp.ones((8, 8))
    with p.step("mm", result_to_fence=None):
        with annotate("matmul"):
            y = x @ x
    jax.block_until_ready(y)
    s = p.summary()
    assert "mm_ms_median" in s
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_ge2e_loop_skips_classification_metrics():
    from titanet_tpu.data import ChunkConfig, DataLoader, SyntheticSpeakerDataset
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import DumbConvNet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.loop import train_one_epoch

    ds = SyntheticSpeakerDataset(n_speakers=4, utterances_per_speaker=4,
                                 min_seconds=1.0, max_seconds=1.2)
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ge2e", 8, 4)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=False), prefetch=0)
    state, metrics, _ = train_one_epoch(
        1, 1, state, loader, model=model, head=head, optimizer=opt,
        frontend=FrontendConfig.from_ms(),
    )
    # no bogus classification metrics for a classifier-less head
    assert "train/accuracy" not in metrics
    assert np.isfinite(metrics["train/avg_loss"])


def _install_fake_wandb(monkeypatch):
    """A minimal in-process wandb stub: records every adapter call so the
    NON-degraded WandbLogger path is exercised offline (the real package is
    not in this image; the adapter's calls are the integration surface)."""
    import sys
    import types

    calls = {"init": [], "log": [], "save": [], "images": [], "finish": 0}

    class _Image:
        def __init__(self, path):
            calls["images"].append(path)
            self.path = path

    class _Run:
        notes = None

        def log(self, metrics, step=None):
            calls["log"].append((dict(metrics), step))

        def save(self, path):
            calls["save"].append(path)

        def finish(self):
            calls["finish"] += 1

    fake = types.ModuleType("wandb")
    fake.Image = _Image

    def init(**kw):
        calls["init"].append(kw)
        return _Run()

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return calls


def test_wandb_adapter_non_degraded_path(monkeypatch, tmp_path):
    """WandbLogger against a stub server module: init config flows, scalars
    and images log with steps, checkpoints upload, finish closes."""
    from titanet_tpu.utils.logging import WandbLogger

    calls = _install_fake_wandb(monkeypatch)
    logger = WandbLogger(enabled=True, project="p", name="run",
                        config={"a": 1})
    assert logger.run is not None, "stub init must produce a live run"
    assert calls["init"][0]["project"] == "p"

    logger.log({"train/loss": 0.5}, step=3)
    fig = tmp_path / "epoch_3_train.png"
    fig.write_bytes(b"\x89PNG fake")
    logger.log_image("train/embeddings", str(fig), step=3)
    logger.save(str(tmp_path / "ckpt"))
    logger.set_notes("notes")
    logger.finish()

    assert calls["log"][0] == ({"train/loss": 0.5}, 3)
    assert calls["images"] == [str(fig)]
    img_log, step = calls["log"][1]
    assert step == 3 and "train/embeddings" in img_log
    assert calls["save"] == [str(tmp_path / "ckpt")]
    assert calls["finish"] == 1


def test_training_loop_pushes_figures_to_wandb(monkeypatch, tmp_path):
    """training_loop with figures enabled logs per-epoch embedding images
    into the W&B sink (reference src/learn.py:401-406)."""
    import jax.numpy as jnp

    from titanet_tpu.data.dataset import SyntheticSpeakerDataset
    from titanet_tpu.data.loader import ChunkConfig, DataLoader
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import DumbConvNet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.loop import training_loop
    from titanet_tpu.utils.logging import WandbLogger

    calls = _install_fake_wandb(monkeypatch)
    ds = SyntheticSpeakerDataset(n_speakers=3, utterances_per_speaker=3,
                                 min_seconds=0.5, max_seconds=0.5)
    loader = DataLoader(ds, batch_size=4, chunk=ChunkConfig(enabled=False),
                        num_workers=0)
    frontend = FrontendConfig.from_ms()
    model = DumbConvNet(hidden_size=8, embedding_size=16, n_layers=1)
    head = build_head("ce", 16, ds.get_num_speakers())
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt,
        jnp.zeros((2, frontend.num_frames(8000), 80)), ds.get_num_speakers(),
    )
    training_loop(
        "wandbrun", 1, state, loader,
        checkpoints_path=str(tmp_path / "ckpt"),
        model=model, head=head, optimizer=opt, frontend=frontend,
        figures_path=str(tmp_path / "figs"), reduction_method="svd",
        checkpoints_frequency=None,
        wandb=WandbLogger(enabled=True),
    )
    assert any("epoch_1_train.png" in p for p in calls["images"])


# ---------------------------------------------------------------------------
# TensorBoard event-file sink (utils/tb_events.py): the wire formats are
# hand-encoded, so the tests verify them at three levels — CRC vectors,
# writer->reader round trip, and the training_loop integration.


def test_crc32c_known_vectors():
    from titanet_tpu.utils.tb_events import crc32c

    # RFC 3720 / standard Castagnoli check values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tb_event_file_roundtrip(tmp_path):
    from titanet_tpu.utils.tb_events import EventFileWriter, read_events

    w = EventFileWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=1)
    w.add_scalars({"val/loss": 0.25, "val/eer": 0.125, "note": "skip-me"},
                  step=2)
    w.add_scalar("neg", -3.75, step=-7)  # negative int64 step encoding
    w.close()

    events = read_events(w.path)  # verifies both CRCs per record
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["scalars"] == {"train/loss": 1.5} and events[1]["step"] == 1
    assert events[2]["scalars"] == {"val/loss": 0.25, "val/eer": 0.125}
    assert events[3]["scalars"] == {"neg": -3.75} and events[3]["step"] == -7
    assert all(e["wall_time"] > 0 for e in events)


def test_tb_event_file_crc_detects_corruption(tmp_path):
    import pytest

    from titanet_tpu.utils.tb_events import EventFileWriter, read_events

    w = EventFileWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=1)
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_events(w.path)


def test_tb_image_logging(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from titanet_tpu.utils.tb_events import EventFileWriter, read_events

    png = tmp_path / "fig.png"
    fig = plt.figure(figsize=(2, 1), dpi=50)
    plt.plot([0, 1], [0, 1])
    fig.savefig(png)
    plt.close(fig)

    w = EventFileWriter(str(tmp_path))
    w.add_image("train/embeddings", str(png), step=3)
    w.close()
    events = read_events(w.path)
    h, width, nbytes = events[1]["images"]["train/embeddings"]
    assert (h, width) == (50, 100)  # figsize * dpi
    assert nbytes == png.stat().st_size
    assert events[1]["step"] == 3


def test_training_loop_writes_tb_events(tmp_path):
    from titanet_tpu.data import ChunkConfig, DataLoader, SyntheticSpeakerDataset
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import DumbConvNet
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import create_train_state, make_optimizer
    from titanet_tpu.train.loop import training_loop
    from titanet_tpu.utils.logging import TensorBoardLogger
    from titanet_tpu.utils.tb_events import read_events

    ds = SyntheticSpeakerDataset(n_speakers=4, utterances_per_speaker=4,
                                 min_seconds=1.0, max_seconds=1.2)
    model = DumbConvNet(hidden_size=16, embedding_size=8, n_layers=1)
    head = build_head("ce", 8, 4)
    opt = make_optimizer()
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 101, 80)), 4
    )
    loader = DataLoader(ds, batch_size=8, chunk=ChunkConfig(enabled=False), prefetch=0)
    tb = TensorBoardLogger(str(tmp_path / "tb"))
    training_loop(
        "run", 2, state, loader, str(tmp_path / "ckpt"),
        model=model, head=head, optimizer=opt, frontend=FrontendConfig.from_ms(),
        checkpoints_frequency=None, tb=tb,
    )
    tb.finish()
    events = read_events(tb.writer.path)
    steps = {e["step"] for e in events if e["scalars"]}
    assert steps == {1, 2}  # one scalar event per epoch
    tags = {t for e in events for t in e["scalars"]}
    assert "train/avg_loss" in tags
