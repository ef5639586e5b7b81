"""Classification/metric heads: CE, SphereFace/CosFace/ArcFace, GE2E.

All heads are jit-friendly: static shapes, no data-dependent Python control
flow, batched math (the reference's GE2E loops over speakers and utterances
in Python — src/losses.py:246-258 — ours is a couple of matmuls).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from titanet_tpu.ops.conv import torch_conv_init


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _safe_l2_normalize(x, axis=-1, eps=1e-8):
    """L2 normalize with a NaN-free gradient at x == 0 (an all-zero
    leave-one-out centroid arises whenever a speaker has a single utterance
    in the batch; sqrt' at 0 would poison the grads)."""
    sumsq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sumsq, eps * eps))


class CEHead(nn.Module):
    """Linear(E -> n_classes) + softmax cross-entropy
    (reference CELoss, src/losses.py:22-44)."""

    n_classes: int
    embedding_size: int = 192
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings: jax.Array, targets: jax.Array):
        logits = nn.Dense(
            self.n_classes,
            kernel_init=torch_conv_init(self.embedding_size),
            bias_init=torch_conv_init(self.embedding_size),
            param_dtype=self.param_dtype,
            name="fc",
        )(embeddings)
        logits = logits.astype(jnp.float32)
        preds = jnp.argmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))
        return _l2_normalize(embeddings), preds, loss


class AngularMarginHead(nn.Module):
    """Unified SphereFace/CosFace/ArcFace via (m1, m2, m3)
    (reference AngularMarginLoss, src/losses.py:47-132):

      target logit    = scale * (cos(m1*theta + m2) - m3)
      non-target logit = scale * cos(theta)
      loss = CE over those logits (with the reference's +eps inside the log)

    The reference renormalizes its weight matrix in-place every forward
    (src/losses.py:86). Functionally we always use the normalized weight in
    the forward; pass the returned params through
    :func:`renormalize_params` after each optimizer step to reproduce the
    reference's in-place projection exactly.

    ``stable=True`` (default) clamps cosines to 1-1e-7 so arccos' gradient
    stays finite (SURVEY.md §7 hard part 6); ``stable=False`` reproduces the
    reference clamp to exactly [-1, 1].

    ``sub_centers`` (K > 1) is the Sub-center ArcFace variant (Deng et
    al., ECCV 2020): K prototype columns per class, per-class cosine =
    max over the class's K sub-centers — robust to intra-class variance
    and label noise at real-corpus scale. K=1 (default) is bit-identical
    to the plain head (same weight shape, same math). Inference/embedding
    paths are untouched — sub-centers exist only inside the train head.

    ``margin_scale`` (a traced scalar in [0, 1], optional) scales every
    margin toward its identity value — ``m1 -> 1 + s*(m1-1)``,
    ``m2 -> s*m2``, ``m3 -> s*m3`` — so the train step can ramp the margin
    from 0 (plain normalized softmax) to its target over early training
    WITHOUT recompilation (the schedule is data, not structure). Margin
    warmup is the standard cure for angular-margin instability in the
    low-data/short-training regime (the reference has no equivalent;
    its margins are fixed constants, src/losses.py:135-183). ``None``
    preserves the exact reference forward bit-for-bit.
    """

    n_classes: int
    embedding_size: int = 192
    scale: Optional[float] = None
    m1: float = 1.0
    m2: float = 0.0
    m3: float = 0.0
    eps: float = 1e-6
    stable: bool = True
    sub_centers: int = 1
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        embeddings: jax.Array,
        targets: jax.Array,
        margin_scale: Optional[jax.Array] = None,
    ):
        weight = self.param(
            "weight",
            torch_conv_init(self.embedding_size),
            (self.embedding_size, self.n_classes * self.sub_centers),
            self.param_dtype,
        )
        emb32 = embeddings.astype(jnp.float32)
        norms = jnp.linalg.norm(emb32, axis=-1)
        normalized = emb32 / jnp.maximum(norms[:, None], 1e-12)
        w = _l2_normalize(weight.astype(jnp.float32), axis=0)
        lim = 1.0 - 1e-7 if self.stable else 1.0
        cosines = jnp.clip(normalized @ w, -lim, lim)
        if self.sub_centers > 1:
            # per-class cosine = max over the class's K sub-centers
            cosines = jnp.max(
                cosines.reshape(-1, self.n_classes, self.sub_centers), axis=-1
            )
        preds = jnp.argmax(cosines, axis=-1)

        scales = (
            jnp.full_like(norms, self.scale) if self.scale is not None else norms
        )
        angles = jnp.arccos(cosines)
        target_angle = jnp.take_along_axis(angles, targets[:, None], axis=1)[:, 0]
        if margin_scale is None:
            m1, m2, m3 = self.m1, self.m2, self.m3
        else:
            s = jnp.asarray(margin_scale, jnp.float32)
            m1 = 1.0 + s * (self.m1 - 1.0)
            m2 = s * self.m2
            m3 = s * self.m3
        numerator = scales * (jnp.cos(m1 * target_angle + m2) - m3)

        # denominator: exp(margined target) + sum over non-target un-margined
        all_logits = scales[:, None] * cosines
        onehot = jax.nn.one_hot(targets, self.n_classes, dtype=jnp.float32)
        # log-sum-exp over {numerator} U {non-target logits}, with reference eps
        masked = jnp.where(onehot.astype(bool), -jnp.inf, all_logits)
        denominator = jnp.exp(numerator) + jnp.sum(
            jnp.where(onehot.astype(bool), 0.0, jnp.exp(masked)), axis=-1
        )
        loss = -jnp.mean(numerator - jnp.log(denominator + self.eps))
        return normalized, preds, loss


class SphereFaceHead(AngularMarginHead):
    """Multiplicative angular margin (src/losses.py:135-149): m1=margin>1."""

    def __post_init__(self):
        assert self.m1 > 1, "Margin out of bounds"
        super().__post_init__()


def make_sphereface(n_classes, embedding_size=192, scale=None, margin=4.0, **kw):
    assert margin > 1, "Margin out of bounds"
    return SphereFaceHead(
        n_classes=n_classes, embedding_size=embedding_size, scale=scale, m1=margin, **kw
    )


class CosFaceHead(AngularMarginHead):
    """Additive cosine margin (src/losses.py:152-166): m3=margin."""


def make_cosface(n_classes, embedding_size=192, scale=64.0, margin=0.2, **kw):
    import numpy as np

    assert 0 <= margin < 1 - np.cos(np.pi / 4), "Margin out of bounds"
    return CosFaceHead(
        n_classes=n_classes, embedding_size=embedding_size, scale=scale, m3=margin, **kw
    )


class ArcFaceHead(AngularMarginHead):
    """Additive angular margin (src/losses.py:169-183): m2=margin."""


def make_arcface(n_classes, embedding_size=192, scale=64.0, margin=0.5, **kw):
    # margin=0 is a legitimate degenerate config (pure normalized softmax
    # at scale s, i.e. NormFace) — used by the margin-decomposition probe
    # in docs/eer_bench and as the natural endpoint of margin warmup.
    assert 0 <= margin < 1, "Margin out of bounds"
    return ArcFaceHead(
        n_classes=n_classes, embedding_size=embedding_size, scale=scale, m2=margin, **kw
    )


class GE2EHead(nn.Module):
    """Generalized end-to-end loss, softmax variant (Wan et al.,
    arXiv:1710.10467; reference GE2ELoss, src/losses.py:186-261).

    Vectorized rebuild: centroids for all classes come from one
    ``one_hot.T @ embeddings`` matmul; leave-one-out centroids for each
    sample's own class are formed in closed form. The reference's Python
    double loop is O(B * n_speakers) CPU-bound; this runs on the MXU.

    Note: the reference implementation has a reduction bug
    (``.sum()`` over all dims at src/losses.py:213,225 collapses centroids
    to scalars). We implement the correct per-dimension centroid math from
    the paper; the leave-one-out divisor follows the reference's choice of
    dividing by the full class count (src/losses.py:212-214).
    """

    n_classes: int
    embedding_size: int = 192
    eps: float = 1e-8
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings: jax.Array, targets: jax.Array):
        w = self.param("w", nn.initializers.constant(1.0), (), self.param_dtype)
        b = self.param("b", nn.initializers.constant(0.0), (), self.param_dtype)

        x = embeddings.astype(jnp.float32)
        onehot = jax.nn.one_hot(targets, self.n_classes, dtype=jnp.float32)  # [B,K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = onehot.T @ x  # [K, E]
        present = counts > 0
        safe_counts = jnp.maximum(counts, 1.0)
        centroids = sums / safe_counts[:, None]  # [K, E]

        # leave-one-out centroid for each sample's own class:
        # (sum_own - x_i) / count_own   (reference divisor, src/losses.py:212-214)
        own_sums = sums[targets]  # [B, E]
        own_counts = safe_counts[targets]  # [B]
        loo = (own_sums - x) / own_counts[:, None]  # [B, E]

        xn = _safe_l2_normalize(x, eps=self.eps)
        sim_all = xn @ _safe_l2_normalize(centroids, eps=self.eps).T  # [B, K]
        sim_own = jnp.sum(xn * _safe_l2_normalize(loo, eps=self.eps), axis=-1)  # [B]

        w_pos = nn.relu(w)
        S = w_pos * sim_all + b  # [B, K]
        S_own = w_pos * sim_own + b  # [B]
        # replace own-class column with the leave-one-out similarity
        S = jnp.where(onehot.astype(bool), S_own[:, None], S)
        # mask classes absent from the batch (reference iterates only
        # speakers present in the batch, src/losses.py:221-229)
        S = jnp.where(present[None, :], S, -jnp.inf)

        loss_i = -S_own + jax.nn.logsumexp(S, axis=-1)
        loss = jnp.sum(loss_i)  # reference returns the total sum (src/losses.py:261)
        return _l2_normalize(embeddings), None, loss


def head_param_count(loss_name: str, embedding_size: int, n_classes: int,
                     sub_centers: int = 1) -> int:
    """Parameter count contributed by each head (for find_n_mega_blocks
    parity with the reference, which counted loss params in the model)."""
    if loss_name == "ce":
        return embedding_size * n_classes + n_classes
    if loss_name in ("sphere", "cos", "arc"):
        return embedding_size * n_classes * sub_centers
    if loss_name == "ge2e":
        return 2
    raise ValueError(loss_name)


def build_head(loss_name: str, embedding_size: int, n_classes: int, **kwargs):
    """Registry constructor (reference LOSSES, src/losses.py:264-270)."""
    if loss_name == "ce":
        return CEHead(n_classes=n_classes, embedding_size=embedding_size)
    if loss_name == "sphere":
        return make_sphereface(n_classes, embedding_size, **kwargs)
    if loss_name == "cos":
        return make_cosface(n_classes, embedding_size, **kwargs)
    if loss_name == "arc":
        return make_arcface(n_classes, embedding_size, **kwargs)
    if loss_name == "ge2e":
        return GE2EHead(n_classes=n_classes, embedding_size=embedding_size)
    raise ValueError(f"Unknown loss {loss_name!r}")


LOSSES = {
    "ce": build_head,
    "sphere": build_head,
    "cos": build_head,
    "arc": build_head,
    "ge2e": build_head,
}


def renormalize_params(head_params):
    """Project angular-margin weights to unit row norm, mirroring the
    reference's in-place renormalization each step (src/losses.py:86)."""
    if "weight" in head_params:
        w = head_params["weight"]
        head_params = dict(head_params)
        head_params["weight"] = w / jnp.maximum(
            jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12
        )
    return head_params
