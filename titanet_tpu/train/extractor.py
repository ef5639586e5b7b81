"""Batched variable-length embedding extraction (serving-side API).

SURVEY.md §7 hard part 5: the throughput metric is utterances/sec/chip for
arbitrary-length inputs, but jit recompiles per shape. This extractor:

- pads each utterance to a small set of LENGTH BUCKETS (geometric spacing)
  so the jit cache holds a handful of executables,
- groups a request into per-bucket sub-batches (fixed batch size, padded),
- splits utterances longer than the largest bucket into overlapping windows
  and averages their unit-norm embeddings (then re-normalizes) — the
  standard long-form recipe; the reference simply fed unbounded T
  (src/models.py:318-339), which recompiles per length and OOMs eventually,
- `warmup()` precompiles every (bucket, batch) executable up front.

Frame masks keep padded samples out of the embedding (bit-exact with
per-utterance computation — see titanet_tpu.ops.frontend).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from titanet_tpu.ops.frontend import FrontendConfig
from titanet_tpu.train.state import embed_step, embed_step_quantized


def geometric_buckets(
    min_samples: int = 16000, max_samples: int = 480000, growth: float = 1.5
) -> List[int]:
    """Length buckets from 1 s to 30 s (defaults), geometrically spaced:
    padding waste <= (growth-1), executable count ~ log(max/min)/log(growth)."""
    buckets = [min_samples]
    while buckets[-1] < max_samples:
        buckets.append(int(buckets[-1] * growth))
    return buckets


class SpeakerEmbedder:
    def __init__(
        self,
        model,
        params,
        batch_stats,
        frontend: Optional[FrontendConfig] = None,
        buckets: Optional[Sequence[int]] = None,
        batch_size: int = 32,
        window_overlap: float = 0.5,
        quantized: bool = False,
    ):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.frontend = frontend or FrontendConfig.from_ms()
        self.buckets = sorted(buckets) if buckets else geometric_buckets()
        self.batch_size = batch_size
        self.window_overlap = window_overlap
        self.qtree = None
        if quantized:
            # int8 encoder matmuls (titanet_tpu.models.quantized): 4x weight
            # compression at >=0.9997 embedding cosine vs f32 — but MEASURED
            # SLOWER than bf16 on TPU v5e (int8 matmuls don't outrun bf16
            # through XLA/Mosaic there; BENCHMARKS.md "quality yes, speed
            # no"). Use for memory-constrained serving, not throughput.
            from titanet_tpu.models.quantized import quantize_titanet

            import jax

            self.qtree = jax.jit(
                lambda v: quantize_titanet(model, v)
            )({"params": params, "batch_stats": batch_stats})

    # -- internals -----------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _embed_padded(self, wavs: List[np.ndarray], bucket: int) -> np.ndarray:
        out = []
        bs = self.batch_size
        for i in range(0, len(wavs), bs):
            group = wavs[i : i + bs]
            batch = np.zeros((bs, bucket), np.float32)
            lengths = np.zeros(bs, np.int32)
            for j, w in enumerate(group):
                batch[j, : len(w)] = w
                lengths[j] = len(w)
            lengths[len(group):] = 1  # harmless filler rows
            # masked=True: pooling/SE exclude padded frames, so a padded
            # batched embedding equals the utterance's solo embedding
            if self.qtree is not None:
                emb = embed_step_quantized(
                    self.qtree, jnp.asarray(batch), jnp.asarray(lengths),
                    frontend=self.frontend, masked=True,
                )
            else:
                emb = embed_step(
                    self.params, self.batch_stats,
                    jnp.asarray(batch), jnp.asarray(lengths),
                    model=self.model, frontend=self.frontend, masked=True,
                )
            out.append(np.asarray(emb)[: len(group)])
        return np.concatenate(out)

    def _windows(self, wav: np.ndarray) -> List[np.ndarray]:
        cap = self.buckets[-1]
        hop = int(cap * (1.0 - self.window_overlap))
        starts = list(range(0, max(len(wav) - cap, 0) + 1, hop))
        if not starts:
            return [wav]
        wins = [wav[s : s + cap] for s in starts]
        if starts[-1] + cap < len(wav):
            wins.append(wav[-cap:])
        return wins

    # -- public API -----------------------------------------------------------
    def warmup(self) -> None:
        """Precompile every (bucket, batch_size) executable."""
        for bucket in self.buckets:
            self._embed_padded([np.zeros(bucket, np.float32)], bucket)

    def embed(self, waveforms: Sequence[np.ndarray]) -> np.ndarray:
        """-> unit-norm embeddings [len(waveforms), E], original order."""
        waveforms = [np.asarray(w, np.float32).reshape(-1) for w in waveforms]
        cap = self.buckets[-1]
        # expand long utterances into windows, tracking ownership
        flat: List[np.ndarray] = []
        owner: List[int] = []
        for i, w in enumerate(waveforms):
            for win in (self._windows(w) if len(w) > cap else [w]):
                flat.append(win)
                owner.append(i)

        # group by bucket, embed, restore order
        order = np.argsort([self._bucket_for(len(w)) for w in flat], kind="stable")
        results = np.zeros((len(flat), self.model.embedding_size), np.float32)
        pos = 0
        while pos < len(order):
            bucket = self._bucket_for(len(flat[order[pos]]))
            group = [order[pos]]
            while (
                pos + len(group) < len(order)
                and self._bucket_for(len(flat[order[pos + len(group)]])) == bucket
            ):
                group.append(order[pos + len(group)])
            emb = self._embed_padded([flat[g] for g in group], bucket)
            results[np.asarray(group)] = emb
            pos += len(group)

        # average window embeddings per utterance, re-normalize
        out = np.zeros((len(waveforms), self.model.embedding_size), np.float32)
        counts = np.zeros(len(waveforms), np.int64)
        for k, i in enumerate(owner):
            out[i] += results[k]
            counts[i] += 1
        out /= np.maximum(counts[:, None], 1)
        out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out
