"""BatchNorm with torch-exact semantics, as explicit functional state.

The reference relies on ``torch.nn.BatchNorm1d`` everywhere
(``/root/reference/src/modules.py:128``, ``src/models.py:454,506,512``).
torch semantics we reproduce exactly:

- normalization uses the *biased* batch variance,
- running-variance updates use the *unbiased* batch variance,
- ``momentum=0.1`` in torch convention: ``new = (1-m)*old + m*batch``,
- statistics are computed over padded frames too (pad-included stats —
  SURVEY.md §7 hard part 2). A masked variant is provided as
  ``mask=`` for correctness-minded users, off by default for parity.

Running statistics live in the flax ``batch_stats`` collection, threaded
explicitly through the jitted train step (no hidden module state — required
for pjit/shard_map and for donation).

Cross-device note: under data parallelism each device computes stats on its
local shard (matching torch DDP's default non-synced BN). ``axis_name`` can
be set to psum-average stats across the mesh (SyncBN), which the reference
could not do at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """torch-compatible BatchNorm over the last (channel) axis.

    Works for ``[B, C]`` and ``[B, T, C]`` inputs: statistics are computed
    over all axes except the last.
    """

    momentum: float = 0.1  # torch convention (new = (1-m)*old + m*batch)
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None  # set for cross-device SyncBN
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        use_running_average: Optional[bool] = None,
        mask: Optional[jax.Array] = None,
        return_scale_shift: bool = False,
    ) -> jax.Array:
        """Normalize ``x`` — or, with ``return_scale_shift=True``, do all
        the statistics bookkeeping (batch stats, EMA/moments publishing)
        but return the per-channel fold vectors ``(a, c)`` with
        ``bn(x) == x * a + c`` (f32) instead of applying them. Lets a
        downstream fused kernel absorb the apply (+activation) without an
        extra [B, T, C] round trip; gradients to the batch statistics
        flow through ``a``/``c`` by autodiff."""
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (ch,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), self.param_dtype)
        )

        reduce_axes = tuple(range(x.ndim - 1))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is not None:
                # mask: [B, T] (1 = valid frame). Masked statistics.
                m = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=reduce_axes) / count
                var = jnp.sum((xf - mean) ** 2 * m, axis=reduce_axes) / count
            else:
                count = jnp.asarray(
                    jnp.prod(jnp.asarray([x.shape[a] for a in reduce_axes])),
                    jnp.float32,
                )
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.var(xf, axis=reduce_axes)
            if self.axis_name is not None:
                # SyncBN: average moments across the data-parallel axis.
                # E[x^2] must be reconstructed from the LOCAL moments.
                local_mean, local_var = mean, var
                mean = jax.lax.pmean(local_mean, self.axis_name)
                mean_sq = jax.lax.pmean(
                    local_var + local_mean**2, self.axis_name
                )
                var = mean_sq - mean**2
                count = count * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                # torch updates running_var with the *unbiased* variance.
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                if self.is_mutable_collection("batch_moments"):
                    # Deferred-EMA mode (opt-in by listing "batch_moments" as
                    # mutable): publish this site's batch moments; the train
                    # step folds ALL sites' EMA updates into one flat op
                    # (ema_update_batch_stats). Rationale: the inline EMA
                    # emits ~2 tiny HBM<->VMEM copies per stat per site
                    # (~100/step at 30+ us each stuck in the DMA queue behind
                    # dropout-mask slices — measured 3.3 ms/step at B=128,
                    # profile_train.py).
                    self.variable(
                        "batch_moments", "mean", jnp.zeros, (ch,), self.param_dtype
                    ).value = mean.astype(self.param_dtype)
                    self.variable(
                        "batch_moments", "var", jnp.ones, (ch,), self.param_dtype
                    ).value = unbiased.astype(self.param_dtype)
                else:
                    m_ = self.momentum
                    ra_mean.value = (1 - m_) * ra_mean.value + m_ * mean.astype(
                        self.param_dtype
                    )
                    ra_var.value = (1 - m_) * ra_var.value + m_ * unbiased.astype(
                        self.param_dtype
                    )

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        if return_scale_shift:
            a = inv * scale.astype(jnp.float32)
            c = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
            return a, c
        if dtype != jnp.float32 and x.dtype == dtype:
            # Low-precision compute path: fold (mean, inv, scale, bias) into
            # per-channel a,b in f32 once, then ONE fused multiply-add in the
            # compute dtype — ~3x less elementwise work + no [B,T,C] f32
            # upcast round-trip vs the parity-ordered chain below. Exact-
            # parity (f32) callers keep torch's operation order.
            a = inv * scale.astype(jnp.float32)
            b = bias.astype(jnp.float32) - mean * a
            return x * a.astype(dtype) + b.astype(dtype)
        out = (x.astype(jnp.float32) - mean) * inv * scale.astype(jnp.float32) + bias.astype(
            jnp.float32
        )
        return out.astype(dtype)


def ema_update_batch_stats(batch_stats, batch_moments, momentum: float = 0.1):
    """One fused EMA update for EVERY BatchNorm site's running statistics.

    Companion to BatchNorm's deferred-EMA mode: ``batch_moments`` holds each
    site's batch mean + unbiased variance (same tree paths as
    ``batch_stats``); this concatenates all leaves into ONE flat vector,
    applies ``new = (1-m)*old + m*batch`` in a single fusion, and slices the
    results back out. Identical math to torch's per-site update
    (reference BatchNorm1d defaults, momentum 0.1), restructured so XLA
    emits one op instead of ~100 latency-bound 1 KB copies per step.
    Leaves missing from ``batch_moments`` (non-BN batch_stats, if any) are
    passed through unchanged.
    """
    flat_old = jax.tree_util.tree_flatten_with_path(batch_stats)
    paths_old, old_leaves = zip(*flat_old[0]) if flat_old[0] else ((), ())
    treedef = flat_old[1]
    moments = dict(jax.tree_util.tree_flatten_with_path(batch_moments)[0])
    if not moments:
        return batch_stats
    upd_idx = [i for i, p in enumerate(paths_old) if p in moments]
    keep = {i: old_leaves[i] for i in range(len(old_leaves)) if i not in set(upd_idx)}
    olds = [old_leaves[i] for i in upd_idx]
    news = [moments[paths_old[i]].astype(old_leaves[i].dtype) for i in upd_idx]
    flat = (1.0 - momentum) * jnp.concatenate(
        [o.ravel() for o in olds]
    ) + momentum * jnp.concatenate([n.ravel() for n in news])
    outs, off = list(range(len(old_leaves))), 0
    for i, o in zip(upd_idx, olds):
        outs[i] = jax.lax.slice(flat, (off,), (off + o.size,)).reshape(o.shape)
        off += o.size
    for i, leaf in keep.items():
        outs[i] = leaf
    return jax.tree_util.tree_unflatten(treedef, outs)


class FastDropout(nn.Module):
    """Bernoulli dropout via one integer compare on raw PRNG bits.

    Distributionally identical to ``nn.Dropout`` (keep with probability
    ``1 - rate``, scale kept values by ``1/(1-rate)``) but skips the
    uint32 -> uniform-float conversion ``jax.random.bernoulli`` performs:
    ``P(bits < floor(keep * 2^32)) = keep`` for uniform uint32 bits. With
    ~50 dropout sites of [B, T, C] activations per TitaNet train step the
    saved VPU passes are measurable (bench notes in BENCHMARKS.md).

    Bit-plane mode: when ``rate == 0.5`` and the caller passes a shared
    u8 ``pool`` (``[W, ...x.shape]``) plus a static ``site`` index, the
    mask is bit ``site % 8`` of word ``site // 8`` — PRNG bits are iid, so
    the 8 planes of one byte are 8 independent masks. TitaNet has ~68
    rate-0.5 sites per step; sharing cuts mask generation + write traffic
    8x (~1 ms/step at B=128, profile_train.py).
    """

    rate: float
    deterministic: bool = False
    site: int = 0  # bit-plane index into a shared pool, when provided

    @nn.compact
    def __call__(self, x: jax.Array, pool: Optional[jax.Array] = None) -> jax.Array:
        if self.deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            # nn.Dropout semantics: everything dropped (1/keep would be a
            # ZeroDivisionError below)
            return jnp.zeros_like(x)
        if pool is not None and self.rate == 0.5:
            word = pool[self.site // 8]
            bit = jnp.uint8(1 << (self.site % 8))
            return jnp.where(
                (word & bit) != 0,
                x * jnp.asarray(2.0, x.dtype),
                jnp.zeros((), x.dtype),
            )
        keep = 1.0 - self.rate
        key = self.make_rng("dropout")
        # uint8 bits when the keep probability is exactly representable in
        # 8 bits (it is for the reference's rate=0.5): 4x fewer PRNG words —
        # bit generation alone measured 2.5 ms of a 32 ms TitaNet-S train
        # step at uint32 (BENCHMARKS.md budget). Falls back to uint32 for
        # rates that 8 bits would quantize.
        if (keep * 256) == int(keep * 256):
            bits = jax.random.bits(key, x.shape, jnp.uint8)
            thresh = jnp.uint8(int(keep * 256) if keep < 1.0 else 255)
        else:
            bits = jax.random.bits(key, x.shape, jnp.uint32)
            thresh = jnp.uint32(min(int(keep * 2**32), 2**32 - 1))
        return jnp.where(
            bits < thresh,
            x * jnp.asarray(1.0 / keep, x.dtype),
            jnp.zeros((), x.dtype),
        )
