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
