"""Model export / serving.

The reference had no export or serving path (SURVEY.md §2.4). Here the
embedding extractor can be exported ahead-of-time via ``jax.export``
(StableHLO): the artifact is self-contained (weights baked in or passed),
loads without the model-building code, and runs on any JAX backend.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_embedder(
    fn: Callable,
    example_args: Sequence,
    path: Optional[str] = None,
) -> bytes:
    """AOT-export a jitted callable to serialized StableHLO bytes."""
    exported = jax_export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_embedder(path_or_bytes) -> Callable:
    """Load an exported artifact; returns a callable running via jax."""
    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return exported.call


def export_titanet_embedder(
    model,
    variables,
    frontend,
    batch_size: int = 8,
    num_samples: int = 48000,
    path: Optional[str] = None,
) -> bytes:
    """Export the full wav->embedding pipeline with weights baked in."""
    from titanet_tpu.models import l2_normalize
    from titanet_tpu.ops.frontend import log_mel_spectrogram

    def embed(wav, lengths):
        mel, _ = log_mel_spectrogram(wav, frontend, lengths=lengths)
        return l2_normalize(model.apply(variables, mel, train=False))

    example = (
        jnp.zeros((batch_size, num_samples), jnp.float32),
        jnp.full((batch_size,), num_samples, jnp.int32),
    )
    return export_embedder(embed, example, path=path)
