"""Training/eval/test/infer loops.

Rebuild of the reference engine (``/root/reference/src/learn.py:204-493``)
around the fused jitted steps:

- per-epoch train with data/compute wall-time split, epoch classification
  metrics, optional embedding figures, console/JSONL/W&B logging,
- validation every ``val_every`` epochs plus first/last (reference
  src/learn.py:271-287),
- abort on non-finite loss (reference src/learn.py:110-112 — here by
  raising, not sys.exit),
- orbax checkpoints every ``checkpoints_frequency`` epochs + final, WITH
  resume (reference was save-only),
- final verification test: embed each test utterance ONCE, score all pairs
  with one matmul (the reference ran 2*N^2 batch-1 forwards,
  src/learn.py:429-439).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from titanet_tpu.data.loader import Batch, DataLoader
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.train import checkpoint as ckpt
from titanet_tpu.train.metrics import (
    all_pairs_scores_labels,
    get_test_metrics,
    metrics_from_class_counts,
)
from titanet_tpu.train.state import (
    TrainState,
    accumulate_metrics,
    embed_step,
    ema_eval_state,
    eval_step,
    init_metrics_acc,
    train_step,
)
from titanet_tpu.utils.logging import (
    ConsoleLogger,
    JsonlLogger,
    StepTimer,
    TensorBoardLogger,
    WandbLogger,
)


class NonFiniteLossError(RuntimeError):
    pass


def _device_batch(batch: Batch, sharding=None):
    from titanet_tpu.data.device_corpus import DeviceBatch

    if isinstance(batch, DeviceBatch):
        # device-resident corpus: the waveform window gathers on device
        # from the ~KB descriptor. Sharded (mesh / multi-host) runs stitch
        # the per-process gathers into the global batch device-side —
        # waveform bytes never revisit the host (DeviceBatch.gather_global)
        if sharding is not None:
            return batch.gather_global(sharding)
        return batch.gather()
    if sharding is not None:
        # multi-process: each host contributes its LOCAL batch as a shard
        # of the global logical batch (global batch = P * local batch);
        # single-process: plain async device_put
        from titanet_tpu.parallel import global_batch_array

        return (
            global_batch_array(sharding, batch.waveform),
            global_batch_array(sharding, batch.lengths),
            global_batch_array(sharding, batch.speaker_ids),
        )
    return (
        jnp.asarray(batch.waveform),
        jnp.asarray(batch.lengths),
        jnp.asarray(batch.speaker_ids),
    )


def _staged_batches(loader, sharding=None, depth: int = 2):
    """Iterate a loader with host->device transfers staged ``depth`` batches
    ahead. ``jax.device_put`` is asynchronous, so batch N+depth uploads while
    step N computes — the loop never waits on PCIe/relay transfer unless the
    device is starved. Yields ((wav, lengths, speakers) device arrays, host
    Batch)."""
    it = iter(loader)
    buf = []

    def stage():
        batch = next(it)
        buf.append((_device_batch(batch, sharding), batch))

    try:
        for _ in range(max(depth, 1)):
            stage()
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            stage()
        except StopIteration:
            pass
        yield out


def train_one_epoch(
    epoch: int,
    total_epochs: int,
    state: TrainState,
    loader: DataLoader,
    *,
    model,
    head,
    optimizer,
    frontend: FrontendConfig,
    augment=None,
    renorm_head: bool = False,
    ema_decay: Optional[float] = None,
    margin_warmup_steps: Optional[int] = None,
    teacher: Optional[tuple] = None,  # (teacher_model, teacher_variables, alpha)
    console: Optional[ConsoleLogger] = None,
    batch_sharding=None,
    collect_embeddings: bool = False,
    nan_check_every: int = 25,
):
    """One training epoch with DEVICE-SIDE metric accumulation: the host
    never reads back per-step values (a readback through the remote-TPU
    relay costs ~30 ms RTT and would serialize with device compute); it
    drains one small accumulator per epoch. Loss finiteness is probed every
    ``nan_check_every`` steps via the accumulator's device flag (the
    reference aborted per step, src/learn.py:110-112 — same failure story,
    checkpoint-resume recovery, just batched). Per-step host sync only
    happens in the interactive paths (console step logging, embedding
    collection for figures)."""
    timer = StepTimer()
    all_targets, all_emb = [], []
    loader.set_epoch(epoch)
    step = 0
    n_steps = len(loader)
    acc = init_metrics_acc(head.n_classes)
    sync_each_step = console is not None and console.enabled
    timer.start("data")
    for (wav, lengths, speakers), batch in _staged_batches(loader, batch_sharding):
        timer.start("model")
        # Uniform-length fast path: a fully-packed bucket (every chunked
        # training batch) needs no per-row reflect-edge fixup, frame mask, or
        # masked zeroing — dropping them removes the scatter/while ops from
        # the jitted step (~1 ms/step at B=128, profile_train.py). jit caches
        # both variants; ragged batches keep exact per-length semantics.
        uniform = int(batch.lengths.min()) == wav.shape[1]
        distill_kw = {}
        if teacher is not None:
            t_model, t_vars, t_alpha = teacher
            distill_kw = dict(teacher_model=t_model, teacher_variables=t_vars,
                              distill_alpha=t_alpha)
        state, metrics = train_step(
            state, wav, None if uniform else lengths, speakers,
            model=model, head=head, optimizer=optimizer, frontend=frontend,
            augment=augment, renorm_head=renorm_head, ema_decay=ema_decay,
            margin_warmup_steps=margin_warmup_steps, **distill_kw,
        )
        acc = accumulate_metrics(acc, metrics["loss"], metrics["preds"], speakers)
        step += 1
        if collect_embeddings:
            all_emb.append(np.asarray(metrics["embeddings"]))
            all_targets.extend(batch.speaker_ids.tolist())
        if sync_each_step:
            loss = float(metrics["loss"])
            if not math.isfinite(loss):
                raise NonFiniteLossError(
                    f"Loss is {loss} at epoch {epoch} step {step}"
                )
            console.log_step("train", epoch, total_epochs, step, n_steps, loss,
                             {"model": timer.totals.get("model", 0.0) / step})
        elif nan_check_every and step % nan_check_every == 0 and bool(acc.nonfinite):
            raise NonFiniteLossError(
                f"Loss became non-finite by epoch {epoch} step {step}"
            )
        timer.start("data")
    timer.stop()

    host_acc = jax.device_get(acc)
    if bool(host_acc.nonfinite):
        raise NonFiniteLossError(f"Loss became non-finite during epoch {epoch}")
    epoch_metrics: Dict[str, float] = {}
    if int(host_acc.n_examples) > 0:
        epoch_metrics = metrics_from_class_counts(
            host_acc.tp, host_acc.pred_count, host_acc.true_count,
            host_acc.correct, host_acc.n_examples, prefix="train",
        )
    total_loss = float(host_acc.loss_sum) if int(host_acc.steps) else float("nan")
    epoch_metrics["train/total_loss"] = total_loss
    epoch_metrics["train/avg_loss"] = total_loss / max(int(host_acc.steps), 1)
    epoch_metrics.update(timer.epoch_metrics("train"))
    embeddings = np.concatenate(all_emb) if all_emb else None
    return state, epoch_metrics, (embeddings, all_targets)


def evaluate(
    epoch,
    total_epochs,
    state: TrainState,
    loader: DataLoader,
    *,
    model,
    head,
    frontend: FrontendConfig,
    console: Optional[ConsoleLogger] = None,
    batch_sharding=None,
    collect_embeddings: bool = False,
    prefix: str = "val",
):
    """No-grad mirror (reference evaluate, src/learn.py:313-406), with the
    same device-side metric accumulation as :func:`train_one_epoch`."""
    timer = StepTimer()
    all_targets, all_emb = [], []
    # Epoch-threaded: with chunking enabled the eval crops vary per epoch
    # (matching the reference, whose DataLoader re-runs per-example
    # transforms at every evaluation); with chunking disabled (the default
    # eval config) every epoch sees identical batches either way.
    loader.set_epoch(epoch if isinstance(epoch, int) else 0)
    acc = init_metrics_acc(head.n_classes)
    timer.start("data")
    for (wav, lengths, speakers), batch in _staged_batches(loader, batch_sharding):
        timer.start("model")
        out = eval_step(
            state, wav, lengths, speakers, model=model, head=head, frontend=frontend
        )
        acc = accumulate_metrics(acc, out["loss"], out["preds"], speakers)
        if collect_embeddings:
            all_emb.append(np.asarray(out["embeddings"]))
            all_targets.extend(batch.speaker_ids.tolist())
        timer.start("data")
    timer.stop()
    host_acc = jax.device_get(acc)
    metrics: Dict[str, float] = {}
    if int(host_acc.n_examples) > 0:
        metrics = metrics_from_class_counts(
            host_acc.tp, host_acc.pred_count, host_acc.true_count,
            host_acc.correct, host_acc.n_examples, prefix=prefix,
        )
    total_loss = float(host_acc.loss_sum) if int(host_acc.steps) else float("nan")
    metrics[f"{prefix}/total_loss"] = total_loss
    metrics[f"{prefix}/avg_loss"] = total_loss / max(int(host_acc.steps), 1)
    metrics.update(timer.epoch_metrics(prefix))
    if console:
        console.log_epoch(prefix, epoch, total_epochs, metrics)
    embeddings = np.concatenate(all_emb) if all_emb else None
    return metrics, (embeddings, all_targets)


def _embed_whole_utterances(state, loader, *, model, frontend):
    """Embed every utterance of a non-chunking loader (masked pooling, so a
    padded batched embedding equals the utterance's solo embedding — the
    reference scores SOLO batch-1 embeddings, src/learn.py:437)."""
    if loader.chunk.enabled:
        raise ValueError(
            "whole-utterance embedding requires a non-chunking loader; "
            "build it with chunk disabled"
        )
    embeddings, speakers = [], []
    loader.set_epoch(0)
    for (wav, lengths, spk_dev), batch in _staged_batches(loader):
        del spk_dev
        emb = embed_step(
            state.params["backbone"], state.batch_stats, wav, lengths,
            model=model, frontend=frontend, masked=True,
        )
        embeddings.append(np.asarray(emb))
        speakers.extend(batch.speaker_ids.tolist())
    return np.concatenate(embeddings), speakers


def run_verification(
    state: TrainState,
    loader: DataLoader,
    *,
    model,
    frontend: FrontendConfig,
    mindcf_p_target: float = 0.01,
    mindcf_c_fa: float = 1.0,
    mindcf_c_miss: float = 1.0,
    console: Optional[ConsoleLogger] = None,
    cohort_loader: Optional[DataLoader] = None,
    cohort_topk: Optional[int] = None,
    calibrate: bool = False,
):
    """Batched all-pairs verification (reference test, src/learn.py:409-459).

    ``cohort_loader`` (utterances from the TRAIN split) enables S-norm /
    AS-norm score calibration — no reference counterpart; see
    :func:`titanet_tpu.train.metrics.snorm_scores`. ``cohort_topk`` selects
    the adaptive (AS-norm) variant. ``calibrate`` additionally fits a
    logistic LLR calibration on the cohort's own all-pairs trials and
    reports Cllr / min Cllr / actual DCF of the calibrated test scores
    (:mod:`titanet_tpu.train.calibration`).
    """
    # The verification protocol scores WHOLE utterances (reference embeds
    # each pair member un-cropped, src/learn.py:437); a chunking loader here
    # would silently score random crops, so refuse it outright.
    embeddings, speakers = _embed_whole_utterances(
        state, loader, model=model, frontend=frontend
    )
    cohort_embeddings = cohort_speakers = None
    if cohort_loader is not None:
        cohort_embeddings, cohort_speakers = _embed_whole_utterances(
            state, cohort_loader, model=model, frontend=frontend
        )
    scores, labels = all_pairs_scores_labels(
        embeddings, speakers,
        cohort_embeddings=cohort_embeddings, cohort_topk=cohort_topk,
    )
    metrics = get_test_metrics(
        scores, labels,
        mindcf_p_target=mindcf_p_target, mindcf_c_fa=mindcf_c_fa,
        mindcf_c_miss=mindcf_c_miss, prefix="test",
    )
    if calibrate:
        if cohort_embeddings is None:
            raise ValueError("calibrate=True requires a cohort_loader "
                             "(labeled dev trials to fit on)")
        from titanet_tpu.train.calibration import (
            LogisticCalibration, actual_dcf, cllr, min_cllr,
        )

        # dev trials: the cohort's own all-pairs scores, transformed the
        # same way as the test scores (same snorm/asnorm settings) so the
        # affine fit transfers
        dev_scores, dev_labels = all_pairs_scores_labels(
            cohort_embeddings, cohort_speakers,
            cohort_embeddings=cohort_embeddings if cohort_topk else None,
            cohort_topk=cohort_topk,
        )
        cal = LogisticCalibration.fit(dev_scores, dev_labels)
        llrs = cal(scores)
        metrics["test/cllr"] = cllr(llrs, labels)
        metrics["test/min_cllr"] = min_cllr(scores, labels)
        metrics["test/act_dcf"] = actual_dcf(
            llrs, labels, p_target=mindcf_p_target,
            c_fa=mindcf_c_fa, c_miss=mindcf_c_miss,
        )
        metrics["test/cal_a"], metrics["test/cal_b"] = cal.a, cal.b
    if console:
        console.log_epoch("test", None, None, metrics)
    return metrics


def training_loop(
    run_name: str,
    epochs: int,
    state: TrainState,
    train_loader: DataLoader,
    checkpoints_path: str,
    *,
    model,
    head,
    optimizer,
    frontend: FrontendConfig,
    augment=None,
    renorm_head: bool = False,
    ema_decay: Optional[float] = None,  # weight EMA; eval/test use EMA weights
    # ramp angular margins 0 -> target over this many optimizer steps
    # (margin warmup; see AngularMarginHead.margin_scale)
    margin_warmup_steps: Optional[int] = None,
    # knowledge distillation: (teacher_model, teacher_variables, alpha)
    teacher: Optional[tuple] = None,
    test_loader: Optional[DataLoader] = None,
    val_loader: Optional[DataLoader] = None,
    val_every: Optional[int] = None,
    figures_path: Optional[str] = None,
    reduction_method: str = "svd",
    checkpoints_frequency: Optional[int] = 25,
    resume: bool = False,
    track_best: str = "val/avg_loss",  # save ckpt "0" whenever this improves
    early_stop_patience: Optional[int] = None,  # in validations, on track_best
    console: Optional[ConsoleLogger] = None,
    jsonl: Optional[JsonlLogger] = None,
    wandb: Optional[WandbLogger] = None,
    tb: Optional[TensorBoardLogger] = None,
    batch_sharding=None,
    cohort_loader: Optional[DataLoader] = None,  # train-split utterances
    cohort_topk: Optional[int] = None,           # for AS-norm test scoring
    calibrate: bool = False,                     # logistic LLR calibration
    mindcf_p_target: float = 0.01,
    mindcf_c_fa: float = 1.0,
    mindcf_c_miss: float = 1.0,
) -> TrainState:
    """Full training loop (reference training_loop, src/learn.py:204-310)
    with resume support."""
    console = console or ConsoleLogger(enabled=False)
    jsonl = jsonl or JsonlLogger(None)
    wandb = wandb or WandbLogger(enabled=False)
    tb = tb or TensorBoardLogger(None)
    run_ckpt_path = os.path.join(checkpoints_path, run_name)
    figures_dir = os.path.join(figures_path, run_name) if figures_path else None
    if figures_dir:
        os.makedirs(figures_dir, exist_ok=True)

    start_epoch = 0
    if resume:
        restored, start_epoch = ckpt.restore_latest(run_ckpt_path, state)
        if restored is not None:
            state = restored
            print(f"[resumed from epoch {start_epoch}]")

    # Failure story: on NonFiniteLossError the run aborts; recovery is
    # resume=true from the last periodic checkpoint. (A "crash checkpoint"
    # is not possible here: the pre-step state was donated to the device and
    # the post-step state already carries the non-finite update.)
    best_value = float("inf")
    vals_since_best = 0
    epoch = start_epoch
    for epoch in range(start_epoch + 1, epochs + 1):
        state, metrics, (train_emb, train_targets) = train_one_epoch(
            epoch, epochs, state, train_loader,
            model=model, head=head, optimizer=optimizer, frontend=frontend,
            augment=augment, renorm_head=renorm_head, ema_decay=ema_decay,
            margin_warmup_steps=margin_warmup_steps, teacher=teacher,
            console=console, batch_sharding=batch_sharding,
            collect_embeddings=figures_dir is not None,
        )
        console.log_epoch("train", epoch, epochs, metrics)
        if figures_dir is not None and train_emb is not None:
            from titanet_tpu.utils.viz import visualize_embeddings

            fig_path = os.path.join(figures_dir, f"epoch_{epoch}_train.png")
            visualize_embeddings(
                train_emb, train_targets, reduction_method=reduction_method,
                save=fig_path,
            )
            # reference pushes each epoch's embedding figure into the W&B
            # run (src/learn.py:401-406)
            wandb.log_image("train/embeddings", fig_path, step=epoch)
            tb.log_image("train/embeddings", fig_path, step=epoch)
        jsonl.log(metrics, step=epoch)
        wandb.log(metrics, step=epoch)
        tb.log(metrics, step=epoch)

        if checkpoints_frequency and epoch % checkpoints_frequency == 0:
            ckpt.save_checkpoint(run_ckpt_path, epoch, state)
            wandb.save(os.path.join(run_ckpt_path, str(epoch)))

        if val_loader is not None and val_every is not None and (
            epoch % val_every == 0 or epoch == 1 or epoch == epochs
        ):
            # with weight EMA on, validation/verification score the EMA
            # weights (the deployable model); the raw params keep training
            val_metrics, (val_emb, val_targets) = evaluate(
                epoch, epochs, ema_eval_state(state), val_loader,
                model=model, head=head, frontend=frontend, console=console,
                batch_sharding=batch_sharding,
                collect_embeddings=figures_dir is not None,
            )
            if figures_dir is not None and val_emb is not None:
                from titanet_tpu.utils.viz import visualize_embeddings

                val_fig = os.path.join(figures_dir, f"epoch_{epoch}_val.png")
                visualize_embeddings(
                    val_emb, val_targets, reduction_method=reduction_method,
                    save=val_fig,
                )
                wandb.log_image("val/embeddings", val_fig, step=epoch)
                tb.log_image("val/embeddings", val_fig, step=epoch)
            jsonl.log(val_metrics, step=epoch)
            wandb.log(val_metrics, step=epoch)
            tb.log(val_metrics, step=epoch)

            # best-checkpoint tracking + early stopping (new vs reference,
            # SURVEY.md §2.4: "no early stopping"). Best lives at step 0
            # (epochs are 1-based, so it never masks restore_latest).
            value = val_metrics.get(track_best)
            if value is not None:
                if value < best_value:
                    best_value = value
                    vals_since_best = 0
                    ckpt.save_checkpoint(run_ckpt_path, 0, state)
                else:
                    vals_since_best += 1
                if (
                    early_stop_patience is not None
                    and vals_since_best >= early_stop_patience
                ):
                    print(
                        f"[early stop at epoch {epoch}: {track_best} has not "
                        f"improved in {vals_since_best} validations]"
                    )
                    break

    if epoch > start_epoch:  # at least one epoch ran
        ckpt.save_checkpoint(run_ckpt_path, epoch, state)

    if test_loader is not None:
        test_metrics = run_verification(
            ema_eval_state(state), test_loader, model=model, frontend=frontend,
            mindcf_p_target=mindcf_p_target, mindcf_c_fa=mindcf_c_fa,
            mindcf_c_miss=mindcf_c_miss, console=console,
            cohort_loader=cohort_loader, cohort_topk=cohort_topk,
            calibrate=calibrate,
        )
        jsonl.log(test_metrics, step=epochs)
        tb.log(test_metrics, step=epochs)
        import json as _json

        wandb.set_notes(_json.dumps(test_metrics, indent=2))
    return state


def infer(
    state: TrainState,
    dataset,
    utterance_indices,
    *,
    model,
    frontend: FrontendConfig,
    sample_rate: int = 16000,
    batch_size: int = 8,
):
    """Embed chosen utterances (reference infer, src/learn.py:462-493),
    batched instead of one-at-a-time."""
    from titanet_tpu.data.loader import DataLoader as _DL, ChunkConfig

    subset_loader = _DL(
        _Subset(dataset, utterance_indices), batch_size=batch_size, shuffle=False,
        drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=sample_rate, prefetch=0,
    )
    out, speakers = [], []
    for batch in subset_loader:
        emb = embed_step(
            state.params["backbone"], state.batch_stats,
            jnp.asarray(batch.waveform), jnp.asarray(batch.lengths),
            model=model, frontend=frontend,
        )
        # f32 at the host boundary: bf16-model embeddings otherwise surface
        # as ml_dtypes arrays that sklearn/matplotlib reject
        out.append(np.asarray(emb, np.float32))
        speakers.extend(batch.speaker_ids.tolist())
    return np.concatenate(out), speakers


def _Subset(dataset, indices):
    from titanet_tpu.data.dataset import Subset

    return Subset(dataset, indices)
