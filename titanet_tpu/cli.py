"""CLI entry point: ``python -m titanet_tpu.cli train -p parameters.yml``.

Rebuild of the reference CLI (``/root/reference/src/train.py``): the same
YAML schema drives model/loss/data/augmentation selection; new subcommands
``eval`` (verification EER/minDCF from a checkpoint) and ``infer`` (embed
dataset utterances or arbitrary audio files, reference ``learn.infer``
src/learn.py:462-493) go beyond the reference.
"""

from __future__ import annotations

import argparse
import datetime
import os
from typing import Optional

import jax
import jax.numpy as jnp

from titanet_tpu.config import Config, load_config
from titanet_tpu.data import (
    ChunkConfig,
    DataLoader,
    ReverbConfig,
    SpeedConfig,
    Subset,
    get_datasets,
)
from titanet_tpu.losses.heads import build_head, head_param_count
from titanet_tpu.models import DumbConvNet, DVectorBaseline, get_titanet
from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.parallel import (
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
)
from titanet_tpu.train import create_train_state, make_optimizer
from titanet_tpu.train.loop import run_verification, training_loop
from titanet_tpu.utils import (
    ConsoleLogger,
    JsonlLogger,
    TensorBoardLogger,
    WandbLogger,
    enable_compilation_cache,
    set_seed,
)
from titanet_tpu.utils import chart_dependencies as _chart_deps


def build_model(cfg: Config, dtype=None):
    """Model selection with reference precedence (src/train.py:87-121);
    ``ecapa.enabled`` (a family beyond the reference) slots in before the
    TitaNet default."""
    if cfg.dumb.enabled:
        return DumbConvNet(
            hidden_size=cfg.dumb.hidden_size,
            embedding_size=cfg.generic.embedding_size,
            n_layers=cfg.dumb.n_layers,
            dtype=dtype,
        )
    if cfg.baseline.enabled:
        return DVectorBaseline(
            n_lstm_layers=cfg.baseline.n_layers,
            hidden_size=cfg.baseline.hidden_size,
            lstm_average=cfg.baseline.average,
            embedding_size=cfg.generic.embedding_size,
            segment_length=cfg.baseline.segment_length,
            dtype=dtype,
        )
    if cfg.ecapa.enabled:
        from titanet_tpu.models import get_ecapa

        return get_ecapa(
            channels=cfg.ecapa.channels,
            embedding_size=cfg.generic.embedding_size,
            attention_hidden_size=cfg.ecapa.attention_hidden_size,
            dtype=dtype,
        )
    if cfg.xvector.enabled:
        from titanet_tpu.models import get_xvector

        return get_xvector(
            hidden_size=cfg.xvector.hidden_size,
            frame_out=cfg.xvector.frame_out,
            embedding_size=cfg.generic.embedding_size,
            dtype=dtype,
        )
    if cfg.resnet.enabled:
        from titanet_tpu.models import get_resnet

        return get_resnet(
            depth=cfg.resnet.depth,
            base_channels=cfg.resnet.base_channels,
            embedding_size=cfg.generic.embedding_size,
            dtype=dtype,
        )
    if cfg.conformer.enabled:
        from titanet_tpu.models import get_conformer

        return get_conformer(
            num_blocks=cfg.conformer.num_blocks,
            dim=cfg.conformer.dim,
            num_heads=cfg.conformer.num_heads,
            ff_hidden=cfg.conformer.ff_hidden,
            conv_kernel=cfg.conformer.conv_kernel,
            dropout=cfg.conformer.dropout,
            embedding_size=cfg.generic.embedding_size,
            dtype=dtype,
        )
    return get_titanet(
        embedding_size=cfg.generic.embedding_size,
        n_mels=cfg.audio.spectrogram.n_mels,
        n_mega_blocks=cfg.titanet.n_mega_blocks,
        model_size=cfg.titanet.model_size,
        attention_hidden_size=cfg.titanet.attention_hidden_size,
        simple_pool=cfg.titanet.simple_pool,
        dropout=cfg.titanet.dropout,
        scan_blocks=cfg.titanet.scan_blocks,
        dtype=dtype,
    )


def _load_teacher(cfg: Config, n_speakers: int):
    """Build the frozen distillation teacher from ``cfg.distill``:
    (teacher_model, teacher_variables, alpha) for the train step, or None.

    The teacher's architecture is THIS config plus
    ``distill.teacher_overrides`` (dotted paths, e.g. disable the student's
    family flag and name the teacher's); its weights come from the orbax
    run dir ``distill.teacher_checkpoint`` (EMA weights when present and
    ``teacher_ema``). The teacher must share the frontend geometry —
    it consumes the same on-device mel as the student.
    """
    if not cfg.distill.enabled:
        return None
    if not cfg.distill.teacher_checkpoint:
        raise ValueError("distill.enabled requires distill.teacher_checkpoint")
    from titanet_tpu.config import apply_overrides
    from titanet_tpu.train import checkpoint as ckpt

    tcfg = (
        apply_overrides(cfg, dict(cfg.distill.teacher_overrides))
        if cfg.distill.teacher_overrides
        else cfg
    )
    teacher_model, _, _, abstract = _rebuild_state(tcfg, n_speakers)
    state, _ = ckpt.restore_latest(cfg.distill.teacher_checkpoint, abstract)
    if state is None:
        raise FileNotFoundError(
            f"no teacher checkpoint under {cfg.distill.teacher_checkpoint!r}"
        )
    params = state.params["backbone"]
    if cfg.distill.teacher_ema and state.ema_params is not None:
        params = state.ema_params["backbone"]
    variables = {"params": params, "batch_stats": state.batch_stats}
    return teacher_model, variables, cfg.distill.alpha


def _margin_warmup_steps(cfg: Config, steps_per_epoch: int):
    """loss.<head>.margin_warmup_epochs -> optimizer steps (None = off)."""
    epochs = {
        "sphere": cfg.loss.sphere.margin_warmup_epochs,
        "cos": cfg.loss.cos.margin_warmup_epochs,
        "arc": cfg.loss.arc.margin_warmup_epochs,
    }.get(cfg.training.loss, 0)
    return epochs * steps_per_epoch if epochs > 0 else None


def build_head_from_config(cfg: Config, n_speakers: int):
    loss_name = cfg.training.loss
    kwargs = {}
    if loss_name == "sphere":
        kwargs = dict(margin=cfg.loss.sphere.margin, scale=cfg.loss.sphere.scale,
                      sub_centers=cfg.loss.sphere.sub_centers)
    elif loss_name == "cos":
        kwargs = dict(margin=cfg.loss.cos.margin, scale=cfg.loss.cos.scale,
                      sub_centers=cfg.loss.cos.sub_centers)
    elif loss_name == "arc":
        kwargs = dict(margin=cfg.loss.arc.margin, scale=cfg.loss.arc.scale,
                      sub_centers=cfg.loss.arc.sub_centers)
    return build_head(loss_name, cfg.generic.embedding_size, n_speakers, **kwargs)


def _synthetic_kwargs(cfg: Config) -> dict:
    # "synthetic" alone or as a member of a "+"-union corpus name
    if "synthetic" not in cfg.dataset.name.split("+"):
        return {}
    return dict(
        n_speakers=cfg.dataset.synthetic_speakers,
        utterances_per_speaker=cfg.dataset.synthetic_utterances,
        seed=cfg.dataset.synthetic_seed,
        formant_jitter=cfg.dataset.synthetic_formant_jitter,
        noise_level=cfg.dataset.synthetic_noise,
        reverb_prob=cfg.dataset.synthetic_reverb_prob,
        pitch_jitter=cfg.dataset.synthetic_pitch_jitter,
        f0_range=(cfg.dataset.synthetic_f0_min, cfg.dataset.synthetic_f0_max),
    )


def _noise_mix_config(cfg: Config):
    """``augmentation.noise.source: files`` -> host-side real-noise mixing
    (MUSAN-style) for the TRAIN loader; None otherwise (the synthetic
    device-side path handles ``source: synthetic``)."""
    no = cfg.augmentation.noise
    if "noise" not in (cfg.augmentation.enable or []) or no.source != "files":
        return None
    from pathlib import Path

    from titanet_tpu.data import NoiseMixConfig

    root = no.corpora_path
    paths = tuple(str(p) for p in Path(root).rglob("*.wav"))
    if not paths and no.download:
        from titanet_tpu.data.acquire import fetch_musan

        fetch_musan(root, subset="noise")
        paths = tuple(str(p) for p in Path(root).rglob("*.wav"))
    if not paths:
        raise FileNotFoundError(
            f"augmentation.noise.source=files but no wavs under {root!r} "
            "(set augmentation.noise.download: true to fetch MUSAN)"
        )
    return NoiseMixConfig(
        paths=paths, probability=cfg.augmentation.probability,
        snr_min=no.snr_min, snr_max=no.snr_max, enabled=True,
    )


def _attach_device_corpus(cfg: Config, loaders):
    """generic.device_corpus: build ONE flat int16 corpus on device for the
    loaders' shared root dataset and switch them to descriptor batches
    (data/device_corpus.py). Process-cached, so benchmark campaigns that
    rebuild identical synthetic corpora re-use the uploaded array.

    Multi-host: each process decodes and uploads ONLY its TRAIN loader's
    static utterance slice (``device_shard_root_indices``), so per-host
    HBM holds ~1/P of the corpus and per-step traffic is descriptor-sized
    on every host. Val/test/cohort loaders stay host-fed there (they run
    a handful of times per run; the train path is the per-step cost)."""
    import jax

    from titanet_tpu.data.device_corpus import (
        DeviceCorpus,
        corpus_cache_key,
        resolve_base,
    )

    if jax.process_count() > 1:
        train_loader = loaders[0]  # train first by _attach call order
        root, _ = resolve_base(train_loader.dataset)
        shard_root = train_loader.device_shard_root_indices()
        corpus = DeviceCorpus.build(
            root, cfg.audio.sample_rate,
            cache_key=corpus_cache_key(root)
            + ("shard", jax.process_index(), jax.process_count()),
            root_indices=shard_root,
        )
        train_loader.attach_device_corpus(corpus)
        return

    roots = {id(resolve_base(l.dataset)[0]): resolve_base(l.dataset)[0]
             for l in loaders}
    corpora = {
        rid: DeviceCorpus.build(
            root, cfg.audio.sample_rate, cache_key=corpus_cache_key(root)
        )
        for rid, root in roots.items()
    }
    for loader in loaders:
        root, _ = resolve_base(loader.dataset)
        loader.attach_device_corpus(corpora[id(root)])


def _cohort_loader(cfg: Config, train_ds):
    """Cohort loader for test-time S-norm/AS-norm score calibration
    (``test.score_norm``): a seeded sample of TRAIN-split utterances (train
    speakers are disjoint from test speakers by the split protocol)."""
    mode = cfg.test.score_norm
    if mode in (None, "none") and not cfg.test.calibration:
        return None, None
    if mode in (None, "none"):
        mode = "none_cohort"  # calibration-only: cohort without snorm
    if mode not in ("snorm", "asnorm", "none_cohort"):
        raise ValueError(
            f"test.score_norm must be 'none', 'snorm' or 'asnorm', got {mode!r}"
        )
    import numpy as np

    rng = np.random.default_rng(cfg.generic.seed)
    n = min(cfg.test.cohort_size, len(train_ds))
    indices = rng.choice(len(train_ds), size=n, replace=False).tolist()
    loader = DataLoader(
        Subset(train_ds, indices), batch_size=cfg.validation.batch_size,
        shuffle=False, drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
    )
    topk = cfg.test.asnorm_topk if mode == "asnorm" else None
    return loader, topk


def train(cfg: Config) -> None:
    if cfg.generic.fast_prng:
        jax.config.update("jax_default_prng_impl", "rbg")
    if cfg.generic.compilation_cache_dir:
        enable_compilation_cache(cfg.generic.compilation_cache_dir)
    key = set_seed(cfg.generic.seed)
    del key
    dtype = jnp.bfloat16 if cfg.training.dtype == "bfloat16" else None

    frontend = FrontendConfig.from_ms(
        sample_rate=cfg.audio.sample_rate,
        n_fft=cfg.audio.spectrogram.n_fft,
        win_ms=cfg.audio.spectrogram.win_length,
        hop_ms=cfg.audio.spectrogram.hop_length,
        n_mels=cfg.audio.spectrogram.n_mels,
        precision=cfg.audio.frontend_precision,
        use_pallas_fused=cfg.audio.use_pallas_fused,
    )

    ds_kwargs = _synthetic_kwargs(cfg)
    train_ds, val_ds, test_ds, n_speakers = get_datasets(
        cfg.dataset.root,
        name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=cfg.test.enabled,
        test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **ds_kwargs,
    )
    if cfg.dumb.enabled:  # reference smoke-test mode (src/train.py:59-60)
        train_ds = test_ds

    chunk = ChunkConfig(
        max_length=cfg.augmentation.chunk.max_length,
        lengths=tuple(cfg.augmentation.chunk.lengths),
        enabled="chunk" in (cfg.augmentation.enable or []),
    )
    enabled_augs = cfg.augmentation.enable or []
    speed = SpeedConfig(
        rates=(cfg.augmentation.speed.min, 1.0, cfg.augmentation.speed.max),
        probability=cfg.augmentation.probability,
        enabled="speed" in enabled_augs,
        continuous=cfg.augmentation.speed.continuous,
    )
    rir_paths: tuple = ()
    if "reverb" in enabled_augs:
        from pathlib import Path

        rir_root = cfg.augmentation.rir.corpora_path
        if cfg.augmentation.rir.download and not list(Path(rir_root).rglob("*.wav")):
            from titanet_tpu.data.acquire import fetch_rir_corpus

            fetch_rir_corpus(rir_root)
        rir_paths = tuple(str(p) for p in Path(rir_root).rglob("*.wav"))
    reverb = ReverbConfig(
        rir_paths=rir_paths,
        probability=cfg.augmentation.probability,
        enabled="reverb" in enabled_augs and bool(rir_paths),
    )
    balanced = None
    if cfg.training.balanced_speakers and cfg.training.balanced_utterances:
        balanced = (cfg.training.balanced_speakers, cfg.training.balanced_utterances)
    # Multi-host: each process loads a disjoint round-robin slice of the
    # epoch's batches (single-process runs see every batch). The schedule
    # length below uses len(train_loader), which is already per-shard.
    cache_kw = dict(
        cache_waveforms=cfg.generic.cache_waveforms,
        cache_budget_mb=cfg.generic.cache_budget_mb,
    )
    noise_mix = _noise_mix_config(cfg)
    train_loader = DataLoader(
        train_ds, batch_size=cfg.training.batch_size, shuffle=True,
        chunk=chunk, speed=speed, reverb=reverb, noise=noise_mix,
        balanced=balanced,
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
        num_workers=max(cfg.generic.workers, 0),
        transport_dtype=cfg.training.transport_dtype,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
        **cache_kw,
    )
    val_loader = DataLoader(
        val_ds, batch_size=cfg.validation.batch_size, shuffle=False,
        chunk=ChunkConfig(enabled=False), sample_rate=cfg.audio.sample_rate,
        seed=cfg.generic.seed, **cache_kw,
    ) if cfg.validation.enabled else None
    test_loader = DataLoader(
        test_ds, batch_size=cfg.validation.batch_size, shuffle=False,
        drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed, **cache_kw,
    ) if cfg.test.enabled else None
    cohort_loader, cohort_topk = (
        _cohort_loader(cfg, train_ds) if cfg.test.enabled else (None, None)
    )
    if cfg.generic.device_corpus:
        _attach_device_corpus(
            cfg, [l for l in (train_loader, val_loader, test_loader,
                              cohort_loader) if l is not None]
        )

    model = build_model(cfg, dtype=dtype)
    head = build_head_from_config(cfg, n_speakers)
    steps_per_epoch = max(len(train_loader), 1)
    optimizer = make_optimizer(
        name=cfg.training.optimizer.type,
        start_lr=cfg.training.optimizer.start_lr,
        weight_decay=cfg.training.optimizer.weight_decay,
        scheduler=cfg.training.optimizer.scheduler,
        end_lr=cfg.training.optimizer.end_lr,
        total_epochs=cfg.training.epochs,
        steps_per_epoch=steps_per_epoch,
        warmup_epochs=cfg.training.optimizer.warmup_epochs,
        grad_clip_norm=cfg.training.optimizer.grad_clip_norm,
        accumulate_steps=cfg.training.optimizer.accumulate_steps,
    )

    example_mel = jnp.zeros(
        (2, frontend.num_frames(cfg.audio.sample_rate), cfg.audio.spectrogram.n_mels)
    )
    state = create_train_state(
        jax.random.key(cfg.generic.seed), model, head, optimizer, example_mel,
        n_speakers, ema=cfg.training.ema_decay > 0,
    )

    if cfg.generic.chart_dependencies:
        _chart_deps(
            model,
            {"params": state.params["backbone"], "batch_stats": state.batch_stats},
            n_mels=cfg.audio.spectrogram.n_mels,
        )

    mesh = make_mesh(cfg.mesh.num_devices, cfg.mesh.data_axis)
    sharding = batch_sharding(mesh, cfg.mesh.data_axis) if mesh.size > 1 else None

    augment = None
    enabled_on_device = cfg.augmentation.enable or []
    if "specaugment" in enabled_on_device or "noise" in enabled_on_device:
        # reference semantics (src/transforms.py:58-72): specaugment =
        # gated time stretch at speed.min..max + freq/time masking;
        # "noise" (beyond the reference) adds device-side gated additive
        # noise at a random SNR before the frontend
        from titanet_tpu.ops.augment import AugmentConfig

        sa = cfg.augmentation.specaugment
        no = cfg.augmentation.noise
        augment = AugmentConfig(
            min_rate=cfg.augmentation.speed.min,
            max_rate=cfg.augmentation.speed.max,
            freq_mask_ratio=sa.freq_mask_ratio, freq_mask_num=sa.freq_mask_num,
            time_mask_ratio=sa.time_mask_ratio, time_mask_num=sa.time_mask_num,
            probability=cfg.augmentation.probability,
            specaugment="specaugment" in enabled_on_device,
            noise_prob=(
                cfg.augmentation.probability
                if "noise" in enabled_on_device and noise_mix is None
                else 0.0
            ),
            noise_snr_min=no.snr_min, noise_snr_max=no.snr_max,
            noise_color=no.color,
        )

    run_name = cfg.training.run_name
    if run_name is None and cfg.training.resume:
        # resume the most recent run under checkpoints_path
        base = cfg.training.checkpoints_path
        if os.path.isdir(base):
            runs = sorted(
                d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
            )
            run_name = runs[-1] if runs else None
    if run_name is None:
        run_name = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    console = ConsoleLogger(enabled=cfg.generic.log_console)
    jsonl = JsonlLogger(os.path.join(cfg.training.checkpoints_path, run_name, "metrics.jsonl"))
    wandb = WandbLogger(
        enabled=cfg.wandb.enabled, api_key_file=cfg.wandb.api_key_file,
        project=cfg.wandb.project, entity=cfg.wandb.entity or None,
        name=run_name, config=cfg.to_dict(),
    )
    tb = TensorBoardLogger(
        os.path.join(cfg.generic.tensorboard_dir, run_name)
        if cfg.generic.tensorboard_dir else None
    )

    training_loop(
        run_name,
        cfg.training.epochs,
        state,
        train_loader,
        cfg.training.checkpoints_path,
        model=model,
        head=head,
        optimizer=optimizer,
        frontend=frontend,
        augment=augment,
        renorm_head=cfg.training.loss in ("sphere", "cos", "arc"),
        ema_decay=cfg.training.ema_decay or None,
        margin_warmup_steps=_margin_warmup_steps(cfg, len(train_loader)),
        teacher=_load_teacher(cfg, n_speakers),
        test_loader=test_loader,
        val_loader=val_loader,
        val_every=cfg.validation.every if cfg.validation.enabled else None,
        figures_path=cfg.figures.path if cfg.figures.enabled else None,
        reduction_method=cfg.figures.reduction_method,
        checkpoints_frequency=cfg.training.checkpoints_frequency,
        resume=cfg.training.resume,
        track_best=cfg.training.track_best,
        early_stop_patience=cfg.training.early_stop_patience,
        console=console,
        jsonl=jsonl,
        wandb=wandb,
        tb=tb,
        batch_sharding=sharding,
        cohort_loader=cohort_loader,
        cohort_topk=cohort_topk,
        calibrate=cfg.test.calibration,
        mindcf_p_target=cfg.test.mindcf_p_target,
        mindcf_c_fa=cfg.test.mindcf_c_fa,
        mindcf_c_miss=cfg.test.mindcf_c_miss,
    )
    wandb.finish()
    tb.finish()


def _rebuild_state(cfg: Config, n_speakers: int):
    if cfg.generic.fast_prng:
        # key dtype must match training's (rbg keys are uint32[4],
        # threefry uint32[2]) or the checkpoint restore shape-mismatches
        jax.config.update("jax_default_prng_impl", "rbg")
    if cfg.generic.compilation_cache_dir:
        enable_compilation_cache(cfg.generic.compilation_cache_dir)
    dtype = jnp.bfloat16 if cfg.training.dtype == "bfloat16" else None
    frontend = FrontendConfig.from_ms(
        sample_rate=cfg.audio.sample_rate,
        n_fft=cfg.audio.spectrogram.n_fft,
        win_ms=cfg.audio.spectrogram.win_length,
        hop_ms=cfg.audio.spectrogram.hop_length,
        n_mels=cfg.audio.spectrogram.n_mels,
        precision=cfg.audio.frontend_precision,
        use_pallas_fused=cfg.audio.use_pallas_fused,
    )
    model = build_model(cfg, dtype=dtype)
    head = build_head_from_config(cfg, n_speakers)
    # the optimizer must match training's so the restored opt_state pytree
    # lines up (orbax restores by structure)
    optimizer = make_optimizer(
        name=cfg.training.optimizer.type,
        start_lr=cfg.training.optimizer.start_lr,
        weight_decay=cfg.training.optimizer.weight_decay,
        scheduler=cfg.training.optimizer.scheduler,
        end_lr=cfg.training.optimizer.end_lr,
        total_epochs=cfg.training.epochs,
        warmup_epochs=cfg.training.optimizer.warmup_epochs,
        grad_clip_norm=cfg.training.optimizer.grad_clip_norm,
        accumulate_steps=cfg.training.optimizer.accumulate_steps,
    )
    example_mel = jnp.zeros(
        (2, frontend.num_frames(cfg.audio.sample_rate), cfg.audio.spectrogram.n_mels)
    )
    state = create_train_state(
        jax.random.key(cfg.generic.seed), model, head, optimizer, example_mel,
        n_speakers, ema=cfg.training.ema_decay > 0,
    )
    return model, head, frontend, state


def evaluate_checkpoint(cfg: Config, checkpoint_dir: str, epoch: Optional[int] = None):
    """Verification EER/minDCF for a saved checkpoint (new vs the reference,
    which could only evaluate inside a live training run)."""
    from titanet_tpu.train import checkpoint as ckpt

    train_ds, val_ds, test_ds, n_speakers = get_datasets(
        cfg.dataset.root,
        name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True,
        test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, head, frontend, abstract = _rebuild_state(cfg, n_speakers)
    if epoch is None:
        state, epoch = ckpt.restore_latest(checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    else:
        state = ckpt.restore_checkpoint(checkpoint_dir, epoch, abstract)
    loader = DataLoader(
        test_ds, batch_size=cfg.validation.batch_size, shuffle=False,
        drop_last=False, chunk=ChunkConfig(enabled=False),
        sample_rate=cfg.audio.sample_rate, seed=cfg.generic.seed,
    )
    from titanet_tpu.train import ema_eval_state

    cohort_loader, cohort_topk = _cohort_loader(cfg, train_ds)
    metrics = run_verification(
        ema_eval_state(state), loader, model=model, frontend=frontend,
        mindcf_p_target=cfg.test.mindcf_p_target,
        mindcf_c_fa=cfg.test.mindcf_c_fa, mindcf_c_miss=cfg.test.mindcf_c_miss,
        console=ConsoleLogger(enabled=True),
        cohort_loader=cohort_loader, cohort_topk=cohort_topk,
        calibrate=cfg.test.calibration,
    )
    print(metrics)
    return metrics


def infer_checkpoint(
    cfg: Config,
    checkpoint_dir: str,
    epoch: Optional[int] = None,
    audio_paths: Optional[list] = None,
    split: str = "test",
    num_utterances: int = 64,
    out_path: Optional[str] = None,
    fig_path: Optional[str] = None,
):
    """Embed utterances with a saved checkpoint (reference ``learn.infer``,
    src/learn.py:462-493, which only existed inside the notebook).

    Two modes:
      * ``audio_paths`` given: embed arbitrary wav/flac files (any length —
        geometric length buckets + windowing via ``SpeakerEmbedder``);
        labels are the file stems.
      * otherwise: embed ``num_utterances`` utterances from the config's
        ``split`` dataset, labels are speaker ids (the notebook's
        visualization path).

    Saves embeddings (+ labels) to ``out_path`` (.npz) and, when
    ``fig_path`` is given, the reference-style 2-D projection scatter.
    Returns ``(embeddings [N, E], labels [N])``.
    """
    import numpy as np

    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state

    _, val_ds, test_ds, n_speakers = get_datasets(
        cfg.dataset.root,
        name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True,
        test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, head, frontend, abstract = _rebuild_state(cfg, n_speakers)
    if epoch is None:
        state, epoch = ckpt.restore_latest(checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    else:
        state = ckpt.restore_checkpoint(checkpoint_dir, epoch, abstract)
    state = ema_eval_state(state)

    if audio_paths:
        from titanet_tpu.data.audio_io import read_audio
        from titanet_tpu.data.loader import _resample_host
        from titanet_tpu.train.extractor import SpeakerEmbedder

        wavs, labels = [], []
        for path in audio_paths:
            wav, sr = read_audio(path)
            wav = np.asarray(wav, np.float32)
            if wav.ndim == 2:  # [C, T] multi-channel: downmix like the loader
                wav = wav.mean(axis=0)
            wav = wav.reshape(-1)
            if sr != cfg.audio.sample_rate:
                wav = _resample_host(wav, sr, cfg.audio.sample_rate)
            wavs.append(wav)
            labels.append(os.path.splitext(os.path.basename(path))[0])
        embedder = SpeakerEmbedder(
            model=model,
            params=state.params["backbone"],
            batch_stats=state.batch_stats,
            frontend=frontend,
        )
        embeddings = np.asarray(embedder.embed(wavs), np.float32)
        labels = np.asarray(labels)
    else:
        from titanet_tpu.train.loop import infer as _infer

        dataset = {"val": val_ds, "test": test_ds}.get(split)
        if dataset is None or len(dataset) == 0:
            raise ValueError(
                f"split {split!r} is empty or disabled in the config"
            )
        indices = list(range(min(num_utterances, len(dataset))))
        embeddings, speakers = _infer(
            state, dataset, indices, model=model, frontend=frontend,
            sample_rate=cfg.audio.sample_rate,
            batch_size=cfg.validation.batch_size,
        )
        labels = np.asarray(speakers)

    if out_path:
        np.savez(out_path, embeddings=embeddings, labels=labels)
        print(f"[saved {len(embeddings)} embeddings -> {out_path}]")
    if fig_path:
        from titanet_tpu.utils.viz import visualize_embeddings

        visualize_embeddings(
            np.asarray(embeddings), np.asarray(labels),
            reduction_method=cfg.figures.reduction_method, save=fig_path,
        )
        print(f"[saved projection figure -> {fig_path}]")
    return embeddings, labels


def trials_checkpoint(
    cfg: Config,
    checkpoint_dir: str,
    trial_file: str,
    epoch: Optional[int] = None,
    audio_root: Optional[str] = None,
    cohort_npz: Optional[str] = None,
    cohort_topk: Optional[int] = None,
    scores_out: Optional[str] = None,
    det_out: Optional[str] = None,
):
    """Score a standard trial list (VoxCeleb ``veri_test2.txt`` / Kaldi
    ``trials`` format) with a saved checkpoint — the field-standard
    verification protocol the reference lacks (its eval is all-pairs on
    its own split, src/learn.py:409-459). See
    :mod:`titanet_tpu.train.trials`.

    ``cohort_npz`` (an ``infer -o`` output: embeddings + labels) enables
    S-norm / AS-norm score normalization against that impostor cohort.
    Returns the metrics dict (EER / minDCF / min-Cllr / counts).
    """
    import numpy as np

    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state
    from titanet_tpu.train.extractor import SpeakerEmbedder
    from titanet_tpu.train.trials import evaluate_trials

    _, _, _, n_speakers = get_datasets(
        cfg.dataset.root,
        name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True,
        test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, head, frontend, abstract = _rebuild_state(cfg, n_speakers)
    if epoch is None:
        state, epoch = ckpt.restore_latest(checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    else:
        state = ckpt.restore_checkpoint(checkpoint_dir, epoch, abstract)
    state = ema_eval_state(state)
    embedder = SpeakerEmbedder(
        model=model,
        params=state.params["backbone"],
        batch_stats=state.batch_stats,
        frontend=frontend,
        batch_size=cfg.validation.batch_size,
    )
    cohort_embeddings = None
    if cohort_npz:
        cohort_embeddings = np.load(cohort_npz)["embeddings"]
    metrics = evaluate_trials(
        trial_file, embedder,
        audio_root=audio_root,
        sample_rate=cfg.audio.sample_rate,
        cohort_embeddings=cohort_embeddings,
        cohort_topk=cohort_topk,
        p_target=cfg.test.mindcf_p_target,
        c_fa=cfg.test.mindcf_c_fa,
        c_miss=cfg.test.mindcf_c_miss,
        scores_out=scores_out,
        det_out=det_out,
    )
    print(
        f"[trials epoch {epoch}] eer={metrics['eer']:.4f} "
        f"mindcf@{cfg.test.mindcf_p_target}={metrics['mindcf']:.4f} "
        f"min_cllr={metrics['min_cllr']:.4f} "
        f"({metrics['n_trials']} trials / {metrics['n_target']} target / "
        f"{metrics['n_files']} files)"
    )
    return metrics


def diarize_checkpoint(
    cfg: Config,
    checkpoint_dir: str,
    audio_paths: list,
    epoch: Optional[int] = None,
    window_s: float = 1.5,
    hop_s: float = 0.75,
    n_speakers: Optional[int] = None,
    max_speakers: int = 8,
    vad: bool = False,
    clustering: str = "nmesc",
    ahc_threshold: float = 0.6,
    overlap_threshold: Optional[float] = None,
    overlap_margin: float = 0.15,
    rttm_out: Optional[str] = None,
):
    """CLI ``diarize``: who-spoke-when over audio files with a saved
    checkpoint (windowed embeddings + clustering —
    :mod:`titanet_tpu.train.diarize`; no reference counterpart, the
    standard production companion of a speaker-embedding model). Prints
    segments per file and optionally writes one RTTM file (uri = the
    audio file's stem). Returns ``{path: [Segment, ...]}``.
    """
    from titanet_tpu.data.audio_io import read_audio
    from titanet_tpu.data.loader import _resample_host
    from titanet_tpu.train import checkpoint as ckpt
    from titanet_tpu.train import ema_eval_state
    from titanet_tpu.train.diarize import diarize, write_rttm
    from titanet_tpu.train.extractor import SpeakerEmbedder

    _, _, _, n_train_speakers = get_datasets(
        cfg.dataset.root,
        name=cfg.dataset.name,
        val=cfg.validation.enabled,
        val_utterances_per_speaker=cfg.validation.num_utterances_per_speaker,
        test=True,
        test_speakers=cfg.test.num_speakers,
        test_utterances_per_speaker=cfg.test.num_utterances_per_speaker,
        exclusive_test_speakers=cfg.test.exclusive_speakers,
        **_synthetic_kwargs(cfg),
    )
    model, _, frontend, abstract = _rebuild_state(cfg, n_train_speakers)
    if epoch is None:
        state, epoch = ckpt.restore_latest(checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    else:
        state = ckpt.restore_checkpoint(checkpoint_dir, epoch, abstract)
    state = ema_eval_state(state)
    embedder = SpeakerEmbedder(
        model=model,
        params=state.params["backbone"],
        batch_stats=state.batch_stats,
        frontend=frontend,
        batch_size=cfg.validation.batch_size,
    )
    sample_rate = cfg.audio.sample_rate
    if rttm_out and os.path.exists(rttm_out):
        os.remove(rttm_out)  # write_rttm appends per uri
    results = {}
    for path in audio_paths:
        wav, sr = read_audio(path)
        if wav.ndim == 2:  # [C, T] multi-channel: downmix like the loader
            wav = wav.mean(axis=0)
        if sr != sample_rate:
            wav = _resample_host(wav, sr, sample_rate)
        segments = diarize(
            wav, sample_rate, embedder,
            window_s=window_s, hop_s=hop_s,
            n_speakers=n_speakers, max_speakers=max_speakers,
            vad=vad, clustering=clustering, ahc_threshold=ahc_threshold,
            overlap_threshold=overlap_threshold,
            overlap_margin=overlap_margin,
        )
        results[path] = segments
        found = len({s.speaker for s in segments})
        print(f"[{path}: {len(segments)} segments, {found} speakers]")
        for s in segments:
            print(f"  {s.start:8.2f}s - {s.end:8.2f}s  speaker {s.speaker}")
        if rttm_out:
            uri = os.path.splitext(os.path.basename(path))[0]
            write_rttm(segments, rttm_out, uri=uri)
    if rttm_out:
        print(f"[rttm written to {rttm_out}]")
    return results


def main(argv: Optional[list] = None):
    # Multi-host: bring up the JAX distributed runtime BEFORE any device
    # use when the env contract is present (TITANET_COORDINATOR /
    # TITANET_DISTRIBUTED=auto); no-op otherwise. See parallel/distributed.
    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="titanet_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_train = sub.add_parser("train", help="train a model (reference-compatible YAML)")
    p_train.add_argument("-p", "--params", required=False, default=None,
                         help="path to parameters .yml")
    p_eval = sub.add_parser("eval", help="verification EER/minDCF from a checkpoint")
    p_eval.add_argument("-p", "--params", required=False, default=None)
    p_eval.add_argument("-c", "--checkpoint-dir", required=True)
    p_eval.add_argument("-e", "--epoch", type=int, default=None)
    p_infer = sub.add_parser(
        "infer", help="embed utterances/audio files with a checkpoint "
        "(reference learn.infer)")
    p_infer.add_argument("-p", "--params", required=False, default=None)
    p_infer.add_argument("-c", "--checkpoint-dir", required=True)
    p_infer.add_argument("-e", "--epoch", type=int, default=None)
    p_infer.add_argument("--audio", nargs="*", default=None,
                         help="wav/flac files (or directories) to embed; "
                         "omit to embed dataset utterances")
    p_infer.add_argument("--split", choices=("val", "test"), default="test")
    p_infer.add_argument("-n", "--num-utterances", type=int, default=64)
    p_infer.add_argument("-o", "--out", default=None,
                         help="output .npz (embeddings + labels)")
    p_infer.add_argument("--fig", default=None,
                         help="save a 2-D projection scatter PNG")
    p_trials = sub.add_parser(
        "trials", help="score a standard trial list (VoxCeleb veri_test2 / "
        "Kaldi format) with a checkpoint")
    p_trials.add_argument("-p", "--params", required=False, default=None)
    p_trials.add_argument("-c", "--checkpoint-dir", required=True)
    p_trials.add_argument("-e", "--epoch", type=int, default=None)
    p_trials.add_argument("--trial-file", required=True,
                          help="'<0|1> <enroll> <test>' or "
                          "'<enroll> <test> target|nontarget' per line")
    p_trials.add_argument("--audio-root", default=None,
                          help="directory trial paths are relative to")
    p_trials.add_argument("--cohort", default=None,
                          help="impostor-cohort .npz from `infer -o` "
                          "(enables S-norm)")
    p_trials.add_argument("--cohort-topk", type=int, default=None,
                          help="AS-norm: use only each side's top-K "
                          "cohort scores")
    p_trials.add_argument("--det-out", default=None,
                          help="write a DET-curve PNG for the trial scores")
    p_trials.add_argument("-o", "--scores-out", default=None,
                          help="write '<enroll> <test> <score>' lines")
    p_diar = sub.add_parser(
        "diarize", help="who-spoke-when over audio files (windowed "
        "embeddings + clustering), optional RTTM output")
    p_diar.add_argument("-p", "--params", required=False, default=None)
    p_diar.add_argument("-c", "--checkpoint-dir", required=True)
    p_diar.add_argument("-e", "--epoch", type=int, default=None)
    p_diar.add_argument("--audio", nargs="+", required=True,
                        help="wav/flac files to diarize")
    p_diar.add_argument("--rttm", default=None,
                        help="write NIST RTTM SPEAKER lines here "
                        "(uri = audio file stem)")
    p_diar.add_argument("--window", type=float, default=1.5)
    p_diar.add_argument("--hop", type=float, default=0.75)
    p_diar.add_argument("--known-k", type=int, default=None,
                        help="fix the speaker count (default: NME-SC auto)")
    p_diar.add_argument("--max-speakers", type=int, default=8)
    p_diar.add_argument("--vad", action="store_true",
                        help="place windows only inside energy-VAD speech")
    p_diar.add_argument("--clustering", choices=("nmesc", "ahc"),
                        default="nmesc")
    p_diar.add_argument("--ahc-threshold", type=float, default=0.6)
    p_diar.add_argument("--overlap", type=float, default=None, metavar="TH",
                        help="emit overlapped second speakers (runner-up "
                        "centroid threshold; calibrate via "
                        "train.diarize.calibrate_overlap_threshold)")
    p_diar.add_argument("--overlap-margin", type=float, default=0.15)
    args = parser.parse_args(argv)
    if args.cmd == "train":
        cfg = load_config(args.params)
        train(cfg)
    elif args.cmd == "eval":
        cfg = load_config(args.params)
        evaluate_checkpoint(cfg, args.checkpoint_dir, args.epoch)
    elif args.cmd == "infer":
        cfg = load_config(args.params)
        audio = None
        if args.audio:
            audio = []
            for p in args.audio:
                if os.path.isdir(p):
                    for root, _, files in sorted(os.walk(p)):
                        audio += [
                            os.path.join(root, f) for f in sorted(files)
                            if f.lower().endswith((".wav", ".flac"))
                        ]
                else:
                    audio.append(p)
        infer_checkpoint(
            cfg, args.checkpoint_dir, args.epoch, audio_paths=audio,
            split=args.split, num_utterances=args.num_utterances,
            out_path=args.out, fig_path=args.fig,
        )
    elif args.cmd == "trials":
        cfg = load_config(args.params)
        trials_checkpoint(
            cfg, args.checkpoint_dir, args.trial_file, args.epoch,
            audio_root=args.audio_root, cohort_npz=args.cohort,
            cohort_topk=args.cohort_topk, scores_out=args.scores_out,
            det_out=args.det_out,
        )
    elif args.cmd == "diarize":
        cfg = load_config(args.params)
        diarize_checkpoint(
            cfg, args.checkpoint_dir, args.audio, args.epoch,
            window_s=args.window, hop_s=args.hop,
            n_speakers=args.known_k, max_speakers=args.max_speakers,
            vad=args.vad, clustering=args.clustering,
            ahc_threshold=args.ahc_threshold,
            overlap_threshold=args.overlap,
            overlap_margin=args.overlap_margin,
            rttm_out=args.rttm,
        )


if __name__ == "__main__":
    main()
