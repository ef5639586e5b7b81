"""Train state and step functions.

Rebuild of the reference's imperative train/eval engine
(``/root/reference/src/learn.py:64-177,313-406``) as pure, jitted functions
over an explicit :class:`TrainState`:

- one fused jitted step: on-device mel frontend (+SpecAugment) -> backbone
  (mutable batch_stats) -> head -> loss -> grads -> optax update
  -> optional angular-head weight renormalization,
- state is donated (no reallocation per step),
- loss non-finiteness is RETURNED as a metric; the loop decides to abort
  (reference called sys.exit inside the loop, src/learn.py:110-112),
- works unchanged on a 1-chip or N-chip mesh: batch sharded on the data
  axis, state replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from titanet_tpu.losses.heads import renormalize_params
from titanet_tpu.models import l2_normalize
from titanet_tpu.ops.augment import AugmentConfig, log_mel_specaugment
from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
from titanet_tpu.ops.norm import ema_update_batch_stats


def _dequantize_waveform(waveform: jax.Array) -> jax.Array:
    """int16 PCM wire format -> float32 on device. The loader can ship
    waveforms as int16 (``transport_dtype="int16"``) to halve host->device
    transfer; audio sources are 16-bit PCM, so the quantization is the
    source's own. Float inputs pass through unchanged."""
    if jnp.issubdtype(waveform.dtype, jnp.integer):
        return waveform.astype(jnp.float32) * (1.0 / 32768.0)
    return waveform


def _as_augment_config(augment) -> Optional[AugmentConfig]:
    """Normalize the static ``augment`` argument: AugmentConfig, or the
    legacy 5-tuple (freq_ratio, freq_n, time_ratio, time_n, prob) —
    masking + time stretch at the reference's default 0.95-1.05 rates."""
    if augment is None or isinstance(augment, AugmentConfig):
        return augment
    fr, fn, tr, tn, prob = augment
    return AugmentConfig(
        freq_mask_ratio=fr, freq_mask_num=fn,
        time_mask_ratio=tr, time_mask_num=tn, probability=prob,
    )


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # {"backbone": ..., "head": ...}
    batch_stats: Any
    opt_state: Any
    key: jax.Array
    # Exponential moving average of `params` (weight EMA — a training-
    # quality capability the reference lacks, SURVEY.md §2.4 "no EMA").
    # None unless create_train_state(..., ema=True); updated by train_step
    # when `ema_decay` is passed; evaluated via ema_eval_state().
    ema_params: Any = None


def create_train_state(
    key: jax.Array,
    model,
    head,
    optimizer: optax.GradientTransformation,
    example_mel: jax.Array,
    n_classes: int,
    ema: bool = False,
) -> Tuple[TrainState, Dict]:
    k_model, k_head, k_state = jax.random.split(key, 3)
    # jit the inits: eager initialization dispatches per-op, which is
    # pathologically slow through remote-TPU tunnels
    variables = jax.jit(model.init, static_argnames=("train",))(
        k_model, example_mel, train=False
    )
    head_vars = jax.jit(head.init)(
        k_head,
        jnp.zeros((2, model.embedding_size), example_mel.dtype),
        jnp.zeros((2,), jnp.int32),
    )
    params = {"backbone": variables["params"], "head": head_vars["params"]}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(optimizer.init)(params),
        key=k_state,
        # distinct buffers, not aliases: the state is donated every step and
        # donating one buffer reachable from two fields is an error
        ema_params=jax.jit(lambda p: jax.tree.map(jnp.copy, p))(params)
        if ema
        else None,
    )


def ema_eval_state(state: TrainState) -> TrainState:
    """State with EMA weights swapped in for evaluation (identity when EMA
    is off). The returned state shares buffers with the input — do NOT pass
    it to a donating step."""
    if state.ema_params is None:
        return state
    return state.replace(params=state.ema_params)


def train_xla_options() -> Dict[str, str]:
    """Per-backend XLA compiler options for the train step.

    On TPU, ``xla_tpu_async_copy_bandwidth_scaling_factor=2.0`` makes the
    memory-space-assignment pass schedule its async param-prefetch copies
    more aggressively; measured on v5e it cuts the TitaNet-S B=128 step
    25.1 -> 24.4 ms, reproducibly, with 0.5/1.5/3.0 all worse (BENCHMARKS.md
    "XLA compiler-option sweep"). Compiler scheduling only — the compiled
    HLO and numerics are identical. Override (or disable with ``{}``) via
    ``TITANET_TRAIN_XLA_OPTIONS`` as a JSON object.
    """
    env = os.environ.get("TITANET_TRAIN_XLA_OPTIONS")
    if env is not None:
        return dict(json.loads(env))
    if jax.default_backend() == "tpu":
        return {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}
    return {}


@functools.lru_cache(maxsize=None)
def _jitted_train_step(options_items: tuple):
    return jax.jit(
        _train_step_impl,
        static_argnames=(
            "model", "head", "optimizer", "frontend", "augment",
            "renorm_head", "masked", "ema_decay", "margin_warmup_steps",
            "teacher_model", "distill_alpha",
        ),
        donate_argnames=("state",),
        compiler_options=dict(options_items) or None,
    )


def train_step(state, waveform, lengths, speakers, **kwargs):
    """One fused wav->grads->update step. Returns (new_state, metrics).

    Thin dispatcher over a jitted implementation so backend-appropriate
    compiler options (:func:`train_xla_options`) apply without the caller
    threading them; jit caching is unaffected (one executable per options
    set). ``state`` is donated — never reuse it after the call.
    """
    opts = tuple(sorted(train_xla_options().items()))
    return _jitted_train_step(opts)(state, waveform, lengths, speakers, **kwargs)


def _train_step_impl(
    state: TrainState,
    waveform: jax.Array,
    lengths: jax.Array,
    speakers: jax.Array,
    *,
    model,
    head,
    optimizer,
    frontend: FrontendConfig,
    augment: Optional[tuple] = None,  # (freq_ratio, freq_n, time_ratio, time_n, prob)
    renorm_head: bool = False,
    masked: bool = False,
    ema_decay: Optional[float] = None,
    margin_warmup_steps: Optional[int] = None,
    # knowledge distillation: frozen teacher (static module + traced
    # variables); student loss becomes
    # (1-alpha)*head_loss + alpha*(1 - cos(student_emb, teacher_emb))
    teacher_model=None,
    teacher_variables=None,
    distill_alpha: float = 0.5,
):
    key, k_aug, k_drop, k_pool = jax.random.split(state.key, 4)
    waveform = _dequantize_waveform(waveform)
    aug = _as_augment_config(augment)
    if aug is not None and aug.noise_prob > 0.0:
        # additive noise at a random SNR (beyond the reference); fold_in
        # keeps the existing k_aug/k_drop streams byte-identical when
        # noise is off
        from titanet_tpu.ops.augment import add_noise

        waveform = add_noise(
            jax.random.fold_in(k_aug, 1), waveform, lengths,
            probability=aug.noise_prob, snr_min=aug.noise_snr_min,
            snr_max=aug.noise_snr_max, color=aug.noise_color,
        )
    if aug is not None and aug.specaugment:
        # full reference SpecAugment: per-example gated time stretch on the
        # spectrogram + freq/time masking (src/transforms.py:167-201)
        mel, mask = log_mel_specaugment(k_aug, waveform, frontend, aug, lengths=lengths)
    else:
        mel, mask = log_mel_spectrogram(waveform, frontend, lengths=lengths)
    model_mask = mask if masked else None
    # NOTE (recorded negative result): sharing one u8 pool across 8
    # rate-0.5 dropout sites via bit planes (FastDropout bit-plane mode,
    # model.dropout_pool_shape) measured 38.4 vs 26.7 ms/step at B=128 —
    # 8x less PRNG generation, but every consumer then re-reads the same
    # HBM-resident pool word and XLA loses its per-site rng-slice
    # pipelining. Per-site u8 masks stay.
    del k_pool
    drop_pool = None

    def loss_fn(params):
        # "batch_moments" mutable => BatchNorm defers its running-stats EMA:
        # sites publish batch moments and ONE fused update runs below
        # (ema_update_batch_stats) instead of ~100 tiny copies inline.
        kwargs = {"drop_pool": drop_pool} if drop_pool is not None else {}
        emb, updates = model.apply(
            {"params": params["backbone"], "batch_stats": state.batch_stats},
            mel,
            train=True,
            mask=model_mask,
            mutable=["batch_stats", "batch_moments"],
            rngs={"dropout": k_drop},
            **kwargs,
        )
        # margin warmup: ramp angular margins linearly over the first
        # `margin_warmup_steps` optimizer steps. The scale is a traced
        # function of state.step, so the schedule costs zero recompiles.
        head_kw = {}
        if margin_warmup_steps is not None and margin_warmup_steps > 0:
            head_kw["margin_scale"] = jnp.clip(
                state.step.astype(jnp.float32) / float(margin_warmup_steps),
                0.0, 1.0,
            )
        norm_emb, preds, loss = head.apply(
            {"params": params["head"]}, emb, speakers, **head_kw
        )
        if teacher_model is not None:
            # the teacher sees the SAME (augmented) mel view in eval mode;
            # cosine distance on unit-norm embeddings is the standard
            # embedding-space distillation objective
            t_emb = teacher_model.apply(
                teacher_variables, mel, train=False, mask=model_mask
            )
            t_emb = jax.lax.stop_gradient(
                l2_normalize(t_emb.astype(jnp.float32))
            )
            distill = jnp.mean(
                1.0 - jnp.sum(norm_emb.astype(jnp.float32) * t_emb, axis=-1)
            )
            loss = (1.0 - distill_alpha) * loss + distill_alpha * distill
        return loss, (norm_emb, preds, updates)

    (loss, (emb, preds, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_stats = ema_update_batch_stats(
        updates["batch_stats"], updates.get("batch_moments", {})
    )
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if renorm_head:
        # mirror the reference's in-place weight renorm each step
        # (src/losses.py:86)
        new_params = dict(new_params)
        new_params["head"] = renormalize_params(dict(new_params["head"]))
    new_ema = state.ema_params
    if ema_decay is not None and state.ema_params is not None:
        # weight EMA (post-update, post-renorm): e <- d*e + (1-d)*p
        new_ema = jax.tree.map(
            lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
            state.ema_params,
            new_params,
        )
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        # None for heads without a classifier (GE2E) — the loop then skips
        # classification metrics, like the reference (src/learn.py:139-142)
        "preds": preds,
        "embeddings": emb,
    }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
        key=key,
        ema_params=new_ema,
    )
    return new_state, metrics


@functools.partial(
    jax.jit,
    static_argnames=("model", "head", "frontend", "masked"),
)
def eval_step(
    state: TrainState,
    waveform: jax.Array,
    lengths: jax.Array,
    speakers: jax.Array,
    *,
    model,
    head,
    frontend: FrontendConfig,
    masked: bool = False,
):
    """No-grad mirror of train_step (reference evaluate, src/learn.py:313-406)."""
    mel, mask = log_mel_spectrogram(_dequantize_waveform(waveform), frontend, lengths=lengths)
    emb = model.apply(
        {"params": state.params["backbone"], "batch_stats": state.batch_stats},
        mel,
        train=False,
        mask=mask if masked else None,
    )
    norm_emb, preds, loss = head.apply(
        {"params": state.params["head"]}, emb, speakers
    )
    return {
        "loss": loss,
        "preds": preds,
        "embeddings": norm_emb,
    }


def infer_xla_options() -> Dict[str, str]:
    """Per-backend XLA compiler options for the inference/serving step.

    Same lever as :func:`train_xla_options`, re-measured on the serving
    path: at B=128 bf16 the mel->embedding batch sits VMEM-resident and
    only the weights stream from HBM, and the more aggressive async-copy
    schedule wins there too — interleaved A/B on v5e: 2.476 -> 2.457
    ms/batch (bw=2.0; bw=4.0 statistically tied at 2.449, the shared 2.0
    constant is kept), losers recorded in BENCHMARKS.md ("Inference
    compiler-option sweep"). Scheduling only — identical HLO/numerics.
    Override (or disable with ``{}``) via ``TITANET_INFER_XLA_OPTIONS``
    as a JSON object.
    """
    env = os.environ.get("TITANET_INFER_XLA_OPTIONS")
    if env is not None:
        return dict(json.loads(env))
    if jax.default_backend() == "tpu":
        return {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}
    return {}


@functools.lru_cache(maxsize=None)
def _jitted_embed_step(options_items: tuple):
    return jax.jit(
        _embed_step_impl,
        static_argnames=("model", "frontend", "masked"),
        compiler_options=dict(options_items) or None,
    )


def embed_step(params, batch_stats, waveform, lengths, **kwargs):
    """Inference: wav -> unit-norm embeddings (reference inference-mode
    forward, src/models.py:332-333). Thin dispatcher so backend-appropriate
    compiler options (:func:`infer_xla_options`) apply without the caller
    threading them; jit caching is unaffected (one executable per options
    set)."""
    opts = tuple(sorted(infer_xla_options().items()))
    return _jitted_embed_step(opts)(params, batch_stats, waveform, lengths, **kwargs)


def _embed_step_impl(
    params,
    batch_stats,
    waveform: jax.Array,
    lengths: jax.Array,
    *,
    model,
    frontend: FrontendConfig,
    masked: bool = False,
):
    mel, mask = log_mel_spectrogram(_dequantize_waveform(waveform), frontend, lengths=lengths)
    emb = model.apply(
        {"params": params, "batch_stats": batch_stats},
        mel,
        train=False,
        mask=mask if masked else None,
    )
    return l2_normalize(emb)


@functools.partial(jax.jit, static_argnames=("frontend", "masked"))
def embed_step_quantized(
    qtree,
    waveform: jax.Array,
    lengths: jax.Array,
    *,
    frontend: FrontendConfig,
    masked: bool = False,
):
    """Int8 serving twin of :func:`embed_step`
    (``titanet_tpu.models.quantized``): wav -> unit-norm embeddings."""
    from titanet_tpu.models.quantized import titanet_apply_quantized

    mel, mask = log_mel_spectrogram(
        _dequantize_waveform(waveform), frontend, lengths=lengths
    )
    emb = titanet_apply_quantized(qtree, mel, mask=mask if masked else None)
    return l2_normalize(emb)


class MetricsAcc(struct.PyTreeNode):
    """Device-side epoch accumulator: per-step losses, finiteness and
    classification counts stay on device; the host reads back ONE small
    pytree per epoch (plus a periodic finiteness probe) instead of syncing
    every step — a value readback through the remote-TPU relay costs
    ~30 ms RTT, which would otherwise serialize with device compute."""

    loss_sum: jax.Array  # f32 scalar
    steps: jax.Array  # int32
    nonfinite: jax.Array  # bool: any step's loss was non-finite
    correct: jax.Array  # int32
    n_examples: jax.Array  # int32
    tp: jax.Array  # int32 [C] true positives per class
    pred_count: jax.Array  # int32 [C] predictions per class
    true_count: jax.Array  # int32 [C] targets per class


def init_metrics_acc(n_classes: int) -> MetricsAcc:
    # distinct buffers: the accumulator is donated each step, and donating
    # one buffer aliased into several fields is an error
    def zc():
        return jnp.zeros((max(n_classes, 1),), jnp.int32)

    return MetricsAcc(
        loss_sum=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        nonfinite=jnp.zeros((), jnp.bool_),
        correct=jnp.zeros((), jnp.int32),
        n_examples=jnp.zeros((), jnp.int32),
        tp=zc(),
        pred_count=zc(),
        true_count=zc(),
    )


@functools.partial(jax.jit, donate_argnames=("acc",))
def accumulate_metrics(
    acc: MetricsAcc,
    loss: jax.Array,
    preds: Optional[jax.Array],
    targets: jax.Array,
) -> MetricsAcc:
    """Fold one step's (loss, preds, targets) into the accumulator."""
    n_classes = acc.tp.shape[0]
    new = acc.replace(
        loss_sum=acc.loss_sum + loss.astype(jnp.float32),
        steps=acc.steps + 1,
        nonfinite=acc.nonfinite | ~jnp.isfinite(loss),
    )
    if preds is None:
        return new
    t1 = jax.nn.one_hot(targets, n_classes, dtype=jnp.int32)
    p1 = jax.nn.one_hot(preds, n_classes, dtype=jnp.int32)
    return new.replace(
        correct=new.correct + (preds == targets).sum().astype(jnp.int32),
        n_examples=new.n_examples + targets.shape[0],
        tp=new.tp + (t1 * p1).sum(axis=0),
        pred_count=new.pred_count + p1.sum(axis=0),
        true_count=new.true_count + t1.sum(axis=0),
    )


def make_optimizer(
    name: str = "adam",
    start_lr: float = 1e-3,
    weight_decay: float = 0.0,
    scheduler: bool = False,
    end_lr: float = 1e-5,
    total_epochs: int = 250,
    steps_per_epoch: int = 1,
    warmup_epochs: int = 0,
    grad_clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """Adam/SGD + optional cosine decay, matching reference train.py:130-144
    (reference steps the scheduler per EPOCH; we translate to per-step).
    Weight decay uses torch Adam semantics (L2 added to gradient) when
    nonzero.

    ``accumulate_steps > 1`` wraps the chain in ``optax.MultiSteps``:
    gradients average over k micro-batches and params update every k-th
    step (effective batch = k x batch_size with the same memory). The
    schedule advances once per REAL update. Caveat: BatchNorm batch
    statistics still update every micro-batch (running stats see the
    micro-batch size) — the standard grad-accumulation semantics."""
    if scheduler:
        lr: Any = optax.cosine_decay_schedule(
            init_value=start_lr,
            decay_steps=max(total_epochs * steps_per_epoch, 1),
            alpha=end_lr / start_lr,
        )
    else:
        lr = start_lr
    if warmup_epochs > 0:
        warmup = optax.linear_schedule(0.0, start_lr, warmup_epochs * steps_per_epoch)
        lr = optax.join_schedules(
            [warmup, lr if callable(lr) else optax.constant_schedule(lr)],
            [warmup_epochs * steps_per_epoch],
        )
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if name == "sgd":
        chain.append(optax.sgd(lr))
    else:
        chain.append(optax.adam(lr))
    # NOTE: optax.flatten (one concatenated update vector) was measured
    # SLOWER here (+4.5 ms/step at B=128): the step's ~2000 tiny f32[256]
    # copies are MSA prefetches of per-site conv/BN params across fwd+bwd
    # consumers, not optimizer staging (SGD vs Adam measures identically),
    # and the flat round-trip adds concat+slice traffic on top.
    opt = optax.chain(*chain)
    if accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_steps)
    return opt
