"""TitaNet (Koluguri et al., arXiv:2110.04410), rebuilt TPU-first.

Structure mirrors the reference (``/root/reference/src/models.py:162-584``)
capability-for-capability, in channels-last ``[B, T, C]`` layout:

  Encoder: prolog ConvBlock(n_mels->H, k=3)
           -> N x MegaBlock(3 depthwise sub-blocks + SE, conv-BN skip)
           -> epilog ConvBlock(H->1536, k=1)
  Decoder: AttentiveStatsPooling -> BN -> Linear(3072->E) -> BN

Differences from the reference by design (not by accident):

- the model NEVER owns the loss: ``__call__`` returns raw embeddings
  ``[B, E]``; classification heads live in ``titanet_tpu.losses`` with their
  own param tree (the reference attached the loss module to the model —
  src/models.py:318-339 — entangling head weights with the model's
  state_dict under ``loss_function.*``),
- BatchNorm state is explicit (flax ``batch_stats``), dropout takes a PRNG
  key, train/eval is a static flag — jit/pjit-safe,
- optional ``mask`` input for length-aware statistics (off = reference
  parity with pad-included stats).

Size presets (src/models.py:296-316): S/M/L = hidden 256/512/1024 with
mega-kernel 3/7/11; common: 3 sub-blocks, encoder out 1536, embedding 192.
Param targets {s: 6.4M, m: 13.4M, l: 25.3M} (src/models.py:173).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import DepthwiseSeparableConv1d, SamePadConv1d, torch_conv_init
from titanet_tpu.ops.norm import BatchNorm, FastDropout
from titanet_tpu.ops.pooling import AttentiveStatsPooling, SimplePooling
from titanet_tpu.ops.se import SqueezeExcitation

TARGET_PARAMS = {"s": 6.4, "m": 13.4, "l": 25.3}


class ConvBlock1d(nn.Module):
    """conv -> BatchNorm -> activation -> dropout (reference ConvBlock1d,
    src/modules.py:96-148)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    activation: Optional[str] = "relu"
    dropout: float = 0.0
    depthwise: bool = False
    drop_site: int = 0  # bit-plane index for the shared dropout pool
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,
        defer_apply: bool = False,
    ) -> jax.Array:
        conv_cls = DepthwiseSeparableConv1d if self.depthwise else SamePadConv1d
        x = conv_cls(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        norm = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )
        if defer_apply:
            # stats bookkeeping runs; the BN apply (+activation) is folded
            # into the consumer (the fused pooling kernel). Only valid for
            # activation='relu' (the kernel applies relu) and dropout=0.
            assert self.activation == "relu" and self.dropout == 0
            a, c = norm(
                x, mask=mask if train else None, return_scale_shift=True
            )
            return x, a, c
        x = norm(x, mask=mask if train else None)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        elif self.activation is not None:
            raise ValueError(f"Incompatible activation {self.activation!r}")
        if self.dropout > 0:
            x = FastDropout(
                rate=self.dropout, deterministic=not train, site=self.drop_site
            )(x, pool=drop_pool)
        return x


class MegaBlock(nn.Module):
    """3 depthwise ConvBlocks -> SE, summed with a 1x1-conv+BN skip branch,
    then ReLU + dropout (reference MegaBlock, src/models.py:407-472)."""

    features: int
    kernel_size: int
    n_sub_blocks: int = 3
    se_reduction: int = 16
    dropout: float = 0.5
    site_base: int = 0  # first dropout bit-plane index for this block
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        # NOTE: (x, mask, drop_pool, train) order so nn.remat can mark
        # `train` (last argnum) static in the Encoder's rematerialized path.
        y = x
        for i in range(self.n_sub_blocks):
            y = ConvBlock1d(
                features=self.features,
                kernel_size=self.kernel_size,
                activation="relu",
                dropout=self.dropout,
                depthwise=True,
                drop_site=self.site_base + i,
                axis_name=self.axis_name,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"sub_block_{i}",
            )(y, train=train, mask=mask, drop_pool=drop_pool)
        y = SqueezeExcitation(
            reduction=self.se_reduction,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="se",
        )(y, mask=mask)

        skip = SamePadConv1d(
            features=self.features,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="skip_conv",
        )(x)
        skip = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="skip_norm",
        )(skip, mask=mask if train else None)

        out = nn.relu(skip + y)
        return FastDropout(
            rate=self.dropout,
            deterministic=not train,
            site=self.site_base + self.n_sub_blocks,
        )(out, pool=drop_pool)


class _MegaBlockScanBody(nn.Module):
    """``nn.scan`` body: one MegaBlock in the ``(carry, ys)`` protocol.

    Used by ``Encoder(scan_blocks=True)``: all N mega-blocks become ONE
    traced block under ``lax.scan`` with parameters stacked on a leading
    ``[N, ...]`` axis — the encoder HLO shrinks ~N-fold (compile time) and
    every per-block param becomes a slice of one large HBM buffer instead
    of its own tiny array. Per-block numerics are identical to the unrolled
    path given the same stacked weights (tests/test_scan_blocks.py,
    :func:`stack_mega_block_params`); dropout masks come from per-iteration
    split RNG streams, so they differ from the unrolled layout's masks
    (both are valid iid Bernoulli draws).

    ``train`` is a module field (not a call arg) so the lifted transforms
    (``nn.scan``, ``nn.remat``) see only array arguments."""

    features: int
    kernel_size: int
    n_sub_blocks: int = 3
    se_reduction: int = 16
    dropout: float = 0.5
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, drop_pool):
        y = MegaBlock(
            features=self.features,
            kernel_size=self.kernel_size,
            n_sub_blocks=self.n_sub_blocks,
            se_reduction=self.se_reduction,
            dropout=self.dropout,
            site_base=0,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="block",
        )(x, mask, drop_pool, self.train)
        return y, ()


class Encoder(nn.Module):
    """Prolog -> N MegaBlocks -> epilog (reference Encoder,
    src/models.py:342-404). Input [B, T, n_mels] -> output [B, T, output_size]."""

    n_mega_blocks: int
    n_sub_blocks: int = 3
    hidden_size: int = 256
    output_size: int = 1536
    mega_block_kernel_size: int = 3
    prolog_kernel_size: int = 3
    epilog_kernel_size: int = 1
    se_reduction: int = 16
    dropout: float = 0.5
    # Rematerialize mega-blocks (trade FLOPs for activation memory). A
    # MEASURED LOSS for speed at TitaNet-S B=128 (25.4 -> 26.6 ms/step
    # full recompute, 27.7 with dots_saveable — BENCHMARKS.md negative
    # results): the train step is HBM-bandwidth-bound and recomputed
    # intermediates still cross HBM at fusion boundaries. Keep False
    # unless activation memory is the constraint (very large B or T).
    remat: bool = False
    remat_policy: Optional[str] = None  # jax.checkpoint_policies name, e.g. "dots_saveable"
    # Run the N mega-blocks as ONE lax.scan iteration with [N, ...]-stacked
    # params instead of N unrolled copies (see _MegaBlockScanBody). Changes
    # the param-tree layout (encoder/mega_blocks/block/... stacked) — use
    # stack_mega_block_params to convert unrolled checkpoints/imports.
    scan_blocks: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,
        defer_epilog: bool = False,
    ) -> jax.Array:
        common = dict(
            axis_name=self.axis_name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        x = ConvBlock1d(
            features=self.hidden_size,
            kernel_size=self.prolog_kernel_size,
            name="prolog",
            **common,
        )(x, train=train, mask=mask)
        remat_policy = (
            getattr(jax.checkpoint_policies, self.remat_policy)
            if self.remat_policy
            else None
        )
        if self.scan_blocks:
            body_cls = _MegaBlockScanBody
            if self.remat:
                body_cls = nn.remat(body_cls, policy=remat_policy)
            scan_cls = nn.scan(
                body_cls,
                variable_axes={"params": 0, "batch_stats": 0, "batch_moments": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.n_mega_blocks,
            )
            x, _ = scan_cls(
                features=self.hidden_size,
                kernel_size=self.mega_block_kernel_size,
                n_sub_blocks=self.n_sub_blocks,
                se_reduction=self.se_reduction,
                dropout=self.dropout,
                train=train,
                name="mega_blocks",
                **common,
            )(x, mask, drop_pool)
            return ConvBlock1d(
                features=self.output_size,
                kernel_size=self.epilog_kernel_size,
                name="epilog",
                **common,
            )(x, train=train, mask=mask, defer_apply=defer_epilog)
        # nn.remat's static_argnums count the module itself at 0, so
        # (x, mask, drop_pool, train) puts `train` at argnum 4
        if self.remat:
            mega_cls = nn.remat(MegaBlock, static_argnums=(4,), policy=remat_policy)
        else:
            mega_cls = MegaBlock
        for i in range(self.n_mega_blocks):
            x = mega_cls(
                features=self.hidden_size,
                kernel_size=self.mega_block_kernel_size,
                n_sub_blocks=self.n_sub_blocks,
                se_reduction=self.se_reduction,
                dropout=self.dropout,
                site_base=i * (self.n_sub_blocks + 1),
                name=f"mega_block_{i}",
                **common,
            )(x, mask, drop_pool, train)
        return ConvBlock1d(
            features=self.output_size,
            kernel_size=self.epilog_kernel_size,
            name="epilog",
            **common,
        )(x, train=train, mask=mask, defer_apply=defer_epilog)


class Decoder(nn.Module):
    """Attentive stats pooling -> BN -> Linear -> BN (reference Decoder,
    src/models.py:475-529). Input [B, T, C] -> embedding [B, E]."""

    embedding_size: int = 192
    attention_hidden_size: int = 128
    simple_pool: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        prescale: Optional[jax.Array] = None,
        preshift: Optional[jax.Array] = None,
    ) -> jax.Array:
        ch = x.shape[-1]
        if self.simple_pool:
            pooled = SimplePooling(
                dtype=self.dtype, param_dtype=self.param_dtype, name="pool"
            )(x, mask=mask)
        else:
            pooled = AttentiveStatsPooling(
                hidden_size=self.attention_hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="pool",
            )(x, mask=mask, prescale=prescale, preshift=preshift)
            pooled = BatchNorm(
                use_running_average=not train,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="pool_norm",
            )(pooled)
        emb = nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(ch * 2),
            bias_init=torch_conv_init(ch * 2),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear",
        )(pooled)
        emb = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_norm",
        )(emb)
        return emb


class TitaNet(nn.Module):
    """Full TitaNet: returns raw (unnormalized) embeddings ``[B, E]``.

    Input is channels-last ``[B, T, n_mels]``. Use
    :func:`titanet_tpu.models.l2_normalize` for inference-mode unit-norm
    embeddings (reference normalizes at src/models.py:333).
    """

    n_mega_blocks: int = 17
    n_sub_blocks: int = 3
    encoder_hidden_size: int = 256
    encoder_output_size: int = 1536
    embedding_size: int = 192
    mega_block_kernel_size: int = 3
    prolog_kernel_size: int = 3
    epilog_kernel_size: int = 1
    attention_hidden_size: int = 128
    se_reduction: int = 16
    simple_pool: bool = False
    dropout: float = 0.5
    remat: bool = False
    remat_policy: Optional[str] = None
    scan_blocks: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def dropout_pool_shape(self, batch: int, n_frames: int):
        """Shape of the shared u8 dropout bit pool for one train step, or
        None when bit-plane sharing does not apply (see FastDropout)."""
        if self.dropout != 0.5 or self.scan_blocks:
            # scan_blocks: the static `site` planes would collide across
            # scan iterations (every block is the same traced body)
            return None
        n_sites = self.n_mega_blocks * (self.n_sub_blocks + 1)
        return (-(-n_sites // 8), batch, n_frames, self.encoder_hidden_size)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,
    ) -> jax.Array:
        # Fused-decoder eligibility: the pooling kernel absorbs the epilog
        # BN apply + relu (epilog returns (h, a, c); y = relu(a*h + c) is
        # computed per-tile in VMEM, so the [B, T, output_size] activation
        # never round-trips HBM between epilog and pooling).
        from titanet_tpu.ops.pallas.pool import kernel_supports

        dt = self.dtype or x.dtype
        fuse = (
            not self.simple_pool
            and mask is None
            and jax.default_backend() == "tpu"
            and kernel_supports(
                self.encoder_output_size,
                self.attention_hidden_size,
                x.shape[1],
                dt,
            )
        )
        enc = Encoder(
            n_mega_blocks=self.n_mega_blocks,
            n_sub_blocks=self.n_sub_blocks,
            hidden_size=self.encoder_hidden_size,
            output_size=self.encoder_output_size,
            mega_block_kernel_size=self.mega_block_kernel_size,
            prolog_kernel_size=self.prolog_kernel_size,
            epilog_kernel_size=self.epilog_kernel_size,
            se_reduction=self.se_reduction,
            dropout=self.dropout,
            remat=self.remat,
            remat_policy=self.remat_policy,
            scan_blocks=self.scan_blocks,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder",
        )(x, train=train, mask=mask, drop_pool=drop_pool, defer_epilog=fuse)
        if fuse:
            enc, prescale, preshift = enc
        else:
            prescale = preshift = None
        return Decoder(
            embedding_size=self.embedding_size,
            attention_hidden_size=self.attention_hidden_size,
            simple_pool=self.simple_pool,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(enc, train=train, mask=mask, prescale=prescale, preshift=preshift)


_SIZE_PRESETS = {
    "s": dict(encoder_hidden_size=256, mega_block_kernel_size=3),
    "m": dict(encoder_hidden_size=512, mega_block_kernel_size=7),
    "l": dict(encoder_hidden_size=1024, mega_block_kernel_size=11),
}


def get_titanet(
    embedding_size: int = 192,
    n_mels: int = 80,
    n_mega_blocks: Optional[int] = None,
    model_size: str = "s",
    attention_hidden_size: int = 128,
    simple_pool: bool = False,
    dropout: float = 0.5,
    scan_blocks: bool = False,
    dtype: Optional[jnp.dtype] = None,
    axis_name: Optional[str] = None,
    head_params_fn=None,
) -> TitaNet:
    """Size-preset constructor (reference get_titanet, src/models.py:262-316).

    If ``n_mega_blocks`` is None, picks the count whose parameter total is
    closest to the paper target (reference find_n_mega_blocks,
    src/models.py:230-260) — computed via ``jax.eval_shape`` so no FLOPs or
    memory are spent building 19 models.
    """
    size = model_size.lower()
    assert size in _SIZE_PRESETS, f"Unsupported model size {model_size!r}"
    if n_mega_blocks is None:
        n_mega_blocks = find_n_mega_blocks(
            embedding_size,
            n_mels,
            size,
            attention_hidden_size=attention_hidden_size,
            simple_pool=simple_pool,
            head_params_fn=head_params_fn,
        )
    return TitaNet(
        n_mega_blocks=n_mega_blocks,
        n_sub_blocks=3,
        encoder_output_size=1536,
        embedding_size=embedding_size,
        attention_hidden_size=attention_hidden_size,
        simple_pool=simple_pool,
        dropout=dropout,
        scan_blocks=scan_blocks,
        dtype=dtype,
        axis_name=axis_name,
        **_SIZE_PRESETS[size],
    )


def stack_mega_block_params(collection: dict, n_mega_blocks: int) -> dict:
    """Convert one variable collection (params / batch_stats / ...) from the
    unrolled layout (``encoder/mega_block_{i}/...``) to the ``scan_blocks``
    layout (``encoder/mega_blocks/block/...`` with a leading ``[N]`` axis).

    Lets unrolled checkpoints and torch imports
    (:func:`titanet_tpu.utils.torch_compat.convert_titanet_state_dict`) load
    into scan models; the inverse is :func:`unstack_mega_block_params`.
    """
    enc = dict(collection["encoder"])
    blocks = [enc.pop(f"mega_block_{i}") for i in range(n_mega_blocks)]
    enc["mega_blocks"] = {
        "block": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    }
    out = dict(collection)
    out["encoder"] = enc
    return out


def unstack_mega_block_params(collection: dict) -> dict:
    """Inverse of :func:`stack_mega_block_params`."""
    enc = dict(collection["encoder"])
    stacked = enc.pop("mega_blocks")["block"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        enc[f"mega_block_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    out = dict(collection)
    out["encoder"] = enc
    return out


def count_params(model: nn.Module, n_mels: int = 80) -> int:
    """Parameter count via shape-only tracing (no allocation/compute)."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 16, n_mels)))
    )
    leaves = jax.tree.leaves(shapes["params"])
    return int(sum(int(jnp.prod(jnp.asarray(l.shape))) for l in leaves))


def titanet_param_count(
    n_mels: int = 80,
    n_mega_blocks: int = 17,
    n_sub_blocks: int = 3,
    hidden: int = 256,
    output_size: int = 1536,
    embedding_size: int = 192,
    kernel: int = 3,
    prolog_kernel: int = 3,
    epilog_kernel: int = 1,
    attention_hidden: int = 128,
    se_reduction: int = 16,
    simple_pool: bool = False,
) -> int:
    """Closed-form parameter count, exact vs :func:`count_params` (tested);
    makes the n_mega_blocks search O(1) instead of tracing 19 models."""
    h, o, e, a = hidden, output_size, embedding_size, attention_hidden
    prolog = prolog_kernel * n_mels * h + h + 2 * h
    sub = (kernel * h + h) + (h * h + h) + 2 * h  # dw-sep + BN
    se = 2 * h * (h // se_reduction)
    skip = h * h + h + 2 * h
    mega = n_sub_blocks * sub + se + skip
    epilog = epilog_kernel * h * o + o + 2 * o
    if simple_pool:
        pool = o * (2 * o) + 2 * o
    else:
        pool = (o * a + a) + (a * o + o) + 2 * (2 * o)  # attn + BN(2o)
    decoder = pool + (2 * o * e + e) + 2 * e
    return prolog + n_mega_blocks * mega + epilog + decoder


def find_n_mega_blocks(
    embedding_size: int = 192,
    n_mels: int = 80,
    model_size: str = "s",
    trials=None,
    attention_hidden_size: int = 128,
    simple_pool: bool = False,
    head_params_fn=None,
) -> int:
    """Pick n_mega_blocks with param count closest to the paper target
    (reference src/models.py:230-260). ``head_params_fn(embedding_size)``
    optionally adds the classification-head parameter count, mirroring the
    reference's inclusion of loss-module params in ``model.parameters()``."""
    trials = trials if trials is not None else range(1, 20)
    target = TARGET_PARAMS[model_size.lower()]
    head = head_params_fn(embedding_size) if head_params_fn else 0
    preset = _SIZE_PRESETS[model_size.lower()]
    best, best_dist = None, float("inf")
    for n in trials:
        params_m = (
            titanet_param_count(
                n_mels=n_mels,
                n_mega_blocks=n,
                hidden=preset["encoder_hidden_size"],
                kernel=preset["mega_block_kernel_size"],
                embedding_size=embedding_size,
                attention_hidden=attention_hidden_size,
                simple_pool=simple_pool,
            )
            + head
        ) / 1e6
        dist = abs(target - params_m)
        if dist < best_dist:
            best, best_dist = n, dist
    return best
