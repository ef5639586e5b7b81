"""MFA-Conformer (Zhang et al., Interspeech 2022, arXiv:2203.15249) —
fifth model family, and the zoo's attention-based archetype.

The reference repo has no attention model at all (its only sequence-global
op is the stats-pooling softmax, /root/reference/src/models.py:570); this
family adds the canonical self-attention speaker embedder, built TPU-first
in the same channels-last ``[B, T, C]`` conventions and from the same op
set as TitaNet/ECAPA/x-vector (torch-exact ``BatchNorm`` with deferred-EMA
moments, masked length-exact statistics, shared attentive-stats pooling),
so it drives ``train_step`` / ``embed_step`` / ``run_verification`` / the
CLI unchanged.

Structure (paper §2; scale defaults give the paper's ~20M "Conformer-S"):

  subsample  Conv2d(1->d, 3x3, stride 2) + ReLU + Conv2d(d->d, 3x3) + ReLU
             over the mel map, then Dense(flatten freq -> dim): 1/2 frame
             rate ([B, T, 80] -> [B, ceil(T/2), dim])
  blocks     N x Conformer block (Gulati et al., arXiv:2005.08100):
               x += 1/2 FFN(LN x);  x += RelPosMHSA(LN x);
               x += ConvModule(LN x);  x += 1/2 FFN(LN x);  x = LN(x)
  MFA        concat every block's output [B, T', N*dim] -> LayerNorm
  pooling    attentive stats (shared op) -> [B, 2*N*dim] -> BN
  head       Dense -> E -> BN (same tail as ECAPA)

TPU-first choices:

- relative-position MHSA (Transformer-XL style, as in the Conformer) with
  the **gather-free pad/reshape skew**: the [B, H, T, 2T-1] position-score
  tensor is realigned with pads + reshapes only (index gathers cost ~25x
  on TPU — CLAUDE.md); verified against an explicit gather in tests,
- softmax and statistics in f32, matmuls in the compute dtype (bf16 on
  TPU serving/training paths),
- static shapes everywhere: the relative-position table is a function of
  the (bucketed) frame count, so jit sees a handful of variants,
- masked length-exactness: attention masks padded KEYS, the depthwise conv
  sees zeroed pads, BN/pooling statistics are mask-aware — a padded batched
  embedding equals the utterance's solo embedding (``masked=True``
  verification protocol), which the paper's implementation lacks.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import torch_conv_init
from titanet_tpu.ops.norm import BatchNorm, FastDropout
from titanet_tpu.ops.pooling import AttentiveStatsPooling


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _zero_padded(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return x
    return x * mask[..., None].astype(x.dtype)


def rel_pos_embedding(t: int, dim: int) -> jax.Array:
    """Sinusoidal embeddings for relative distances ``T-1 .. -(T-1)``.

    Row ``r`` encodes distance ``(t - 1) - r`` — positive (query after key)
    first. f32, ``[2T-1, dim]``.
    """
    pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)
    half = jnp.arange(0, dim, 2, dtype=jnp.float32)
    inv = jnp.exp(half * (-math.log(10000.0) / dim))
    ang = pos[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def rel_shift(x: jax.Array) -> jax.Array:
    """``out[..., i, j] = x[..., i, (T-1) - i + j]`` via pad + reshape.

    ``x`` is ``[B, H, T, 2T-1]`` of query-by-relative-distance scores (last
    axis indexed per :func:`rel_pos_embedding`); returns the ``[B, H, T, T]``
    query-by-key alignment. Pure pads/reshapes/slices — no gathers (index
    gathers cost ~25x on TPU).
    """
    b, h, t, r = x.shape
    assert r == 2 * t - 1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, H, T, 2T]
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :]  # drop the pad column, now row-shifted
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


class RelPosSelfAttention(nn.Module):
    """Multi-head self-attention with Transformer-XL relative positions
    (Dai et al., arXiv:1901.02860, as used by the Conformer):

      score = (q + u) k^T + skew((q + v) p^T)

    with learned global biases ``u``/``v`` (one per head dim) and ``p`` a
    linear projection of the sinusoidal relative-distance table.
    """

    num_heads: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        b, t, d = x.shape
        h = self.num_heads
        assert d % h == 0, "dim must divide num_heads"
        dh = d // h
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        dense = dict(
            kernel_init=torch_conv_init(d),
            bias_init=torch_conv_init(d),
            dtype=dt,
            param_dtype=self.param_dtype,
        )
        q = nn.Dense(d, name="q", **dense)(x).reshape(b, t, h, dh)
        k = nn.Dense(d, name="k", **dense)(x).reshape(b, t, h, dh)
        v = nn.Dense(d, name="v", **dense)(x).reshape(b, t, h, dh)
        # position projection has no bias (a bias is position-independent,
        # i.e. redundant with u/v)
        p = nn.Dense(d, use_bias=False, name="pos", kernel_init=torch_conv_init(d),
                     dtype=dt, param_dtype=self.param_dtype)(
            rel_pos_embedding(t, d).astype(dt)
        ).reshape(2 * t - 1, h, dh)
        u = self.param("pos_bias_u", nn.initializers.zeros, (h, dh), self.param_dtype)
        vb = self.param("pos_bias_v", nn.initializers.zeros, (h, dh), self.param_dtype)

        content = jnp.einsum("bihn,bjhn->bhij", q + u.astype(dt), k)
        pos_score = jnp.einsum("bihn,rhn->bhir", q + vb.astype(dt), p)
        scores = (content + rel_shift(pos_score)).astype(jnp.float32)
        scores = scores / math.sqrt(dh)
        if mask is not None:
            # exclude padded KEYS; padded query rows are zeroed downstream
            scores = scores + (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e9
        alphas = jax.nn.softmax(scores, axis=-1).astype(dt)
        out = jnp.einsum("bhij,bjhn->bihn", alphas, v).reshape(b, t, d)
        return nn.Dense(d, name="out", **dense)(out)


class ConformerConvModule(nn.Module):
    """Pointwise(2d) -> GLU -> depthwise(k) -> BN -> swish -> pointwise(d).

    The depthwise conv reads neighbors, so pads are zeroed first and BN
    statistics are mask-aware — keeps padded batches length-exact.
    """

    kernel_size: int = 15
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        d = x.shape[-1]
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        dense = dict(dtype=dt, param_dtype=self.param_dtype)
        gate = nn.Dense(2 * d, name="pw1", kernel_init=torch_conv_init(d),
                        bias_init=torch_conv_init(d), **dense)(x)
        a, g = jnp.split(gate, 2, axis=-1)
        x = a * jax.nn.sigmoid(g)  # GLU
        x = _zero_padded(x, mask)
        x = nn.Conv(
            features=d,
            kernel_size=(self.kernel_size,),
            feature_group_count=d,
            padding="SAME",
            name="dw",
            kernel_init=torch_conv_init(self.kernel_size),
            bias_init=torch_conv_init(self.kernel_size),
            **dense,
        )(x)
        x = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            name="bn",
            **dense,
        )(x, mask=mask if train else None)
        x = _swish(x)
        return nn.Dense(d, name="pw2", kernel_init=torch_conv_init(d),
                        bias_init=torch_conv_init(d), **dense)(x)


class ConformerBlock(nn.Module):
    """One Conformer block (arXiv:2005.08100 Fig. 1): FFN halves sandwich
    self-attention and the conv module, all pre-LayerNorm residuals."""

    num_heads: int = 4
    ff_hidden: int = 2048
    conv_kernel: int = 15
    dropout: float = 0.1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def _ffn(self, x, d, train, name):
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        dense = dict(dtype=dt, param_dtype=self.param_dtype)
        x = nn.Dense(self.ff_hidden, name=f"{name}_in",
                     kernel_init=torch_conv_init(d),
                     bias_init=torch_conv_init(d), **dense)(x)
        x = _swish(x)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(d, name=f"{name}_out",
                        kernel_init=torch_conv_init(self.ff_hidden),
                        bias_init=torch_conv_init(self.ff_hidden), **dense)(x)

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        d = x.shape[-1]
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        ln = dict(dtype=dt, param_dtype=self.param_dtype)
        # FastDropout: raw-PRNG-bit masks (distributionally identical to
        # nn.Dropout; shared house op — see ops/norm.py)
        drop = lambda y: FastDropout(self.dropout, deterministic=not train)(y)  # noqa: E731

        x = x + 0.5 * drop(self._ffn(nn.LayerNorm(name="ln_ff1", **ln)(x), d, train, "ff1"))
        x = x + drop(
            RelPosSelfAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mhsa",
            )(nn.LayerNorm(name="ln_mhsa", **ln)(x), mask=mask)
        )
        x = x + drop(
            ConformerConvModule(
                kernel_size=self.conv_kernel, axis_name=self.axis_name,
                dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
            )(nn.LayerNorm(name="ln_conv", **ln)(x), train=train, mask=mask)
        )
        x = x + 0.5 * drop(self._ffn(nn.LayerNorm(name="ln_ff2", **ln)(x), d, train, "ff2"))
        return nn.LayerNorm(name="ln_out", **ln)(x)


class ConvSubsampling(nn.Module):
    """1/2-rate conv subsampling over the mel map (paper §2.1): two 3x3
    convs (first stride 2) on ``[B, T, F, 1]``, then Dense over the
    flattened (freq x channels) axis.

    torch-style FIXED padding (1 per side), not "SAME": SAME's split pad
    depends on length parity, so a solo forward and a longer padded batch
    would misalign for odd utterance lengths (same reasoning as
    :mod:`titanet_tpu.models.resnet`). Fixed padding centers output ``j``
    on input ``2j``, so the downsampled mask is plain ``mask[:, ::2]`` and
    masked batched embeddings stay length-exact at any parity.
    """

    dim: int = 256
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        dt = self.dtype or jnp.result_type(x.dtype, self.param_dtype)
        conv = dict(kernel_size=(3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    param_dtype=self.param_dtype)
        h = x[..., None]  # [B, T, F, 1]
        h = nn.Conv(self.dim, strides=(2, 2), name="conv1",
                    kernel_init=torch_conv_init(9),
                    bias_init=torch_conv_init(9), **conv)(h)
        h = nn.relu(h)
        if mask is not None:
            # zero invalid frames so conv2's receptive field matches the
            # solo forward (whose padding IS zeros) at the valid boundary
            h = h * mask[:, ::2, None, None].astype(h.dtype)
        h = nn.Conv(self.dim, strides=(1, 1), name="conv2",
                    kernel_init=torch_conv_init(9 * self.dim),
                    bias_init=torch_conv_init(9 * self.dim), **conv)(h)
        h = nn.relu(h)
        b, t2, f2, c = h.shape
        h = h.reshape(b, t2, f2 * c)
        return nn.Dense(self.dim, name="proj",
                        kernel_init=torch_conv_init(f2 * c),
                        bias_init=torch_conv_init(f2 * c),
                        dtype=dt, param_dtype=self.param_dtype)(h)


class MfaConformer(nn.Module):
    """Full MFA-Conformer: mel ``[B, T, n_mels]`` -> raw embedding ``[B, E]``.

    Same calling convention as the other families (``train`` static flag,
    optional frame ``mask``, explicit ``batch_stats``/``batch_moments``
    state, ``"dropout"`` rng in training).
    """

    num_blocks: int = 6
    dim: int = 256
    num_heads: int = 4
    ff_hidden: int = 2048
    conv_kernel: int = 15
    dropout: float = 0.1
    attention_hidden_size: int = 128
    embedding_size: int = 192
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        drop_pool: Optional[jax.Array] = None,  # API-compat (FastDropout pool)
    ) -> jax.Array:
        del drop_pool
        h = ConvSubsampling(dim=self.dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="subsample")(
            _zero_padded(x, mask), mask=mask
        )
        mask2 = mask[:, ::2] if mask is not None else None
        h = _zero_padded(h, mask2)
        outs = []
        for i in range(self.num_blocks):
            h = ConformerBlock(
                num_heads=self.num_heads,
                ff_hidden=self.ff_hidden,
                conv_kernel=self.conv_kernel,
                dropout=self.dropout,
                axis_name=self.axis_name,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(h, train=train, mask=mask2)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)  # MFA [B, T', N*dim]
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="mfa_norm")(h)
        pooled = AttentiveStatsPooling(
            hidden_size=self.attention_hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pool",
        )(_zero_padded(h, mask2), mask=mask2)
        pooled = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="pool_norm",
        )(pooled)
        emb = nn.Dense(
            self.embedding_size,
            kernel_init=torch_conv_init(2 * self.num_blocks * self.dim),
            bias_init=torch_conv_init(2 * self.num_blocks * self.dim),
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear",
        )(pooled)
        return BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_norm",
        )(emb)


def get_conformer(
    num_blocks: int = 6,
    dim: int = 256,
    num_heads: int = 4,
    ff_hidden: int = 2048,
    conv_kernel: int = 15,
    dropout: float = 0.1,
    embedding_size: int = 192,
    attention_hidden_size: int = 128,
    axis_name: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
) -> MfaConformer:
    """Paper-scale defaults (~20M params): 6 blocks, dim 256, 4 heads,
    FF 2048, conv kernel 15 (arXiv:2203.15249 §3.2 "Conformer (small)")."""
    return MfaConformer(
        num_blocks=num_blocks,
        dim=dim,
        num_heads=num_heads,
        ff_hidden=ff_hidden,
        conv_kernel=conv_kernel,
        dropout=dropout,
        embedding_size=embedding_size,
        attention_hidden_size=attention_hidden_size,
        axis_name=axis_name,
        dtype=dtype,
    )
