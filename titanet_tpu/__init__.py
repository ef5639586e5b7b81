"""titanet_tpu — a TPU-native (JAX/XLA/Pallas) speaker-embedding framework.

A from-scratch rebuild of the capabilities of Wadaboa/titanet (reference:
TitaNet speaker embeddings, arXiv:2110.04410) designed TPU-first:

- channels-last ``[B, T, C]`` layouts sized for the MXU,
- a fully on-device mel-spectrogram frontend (framing + DFT-as-matmul + mel
  filterbank + dB + L2-norm) with a fused Pallas kernel path,
- functional flax.linen modules with explicit BatchNorm state and PRNG keys,
- ``jax.sharding.Mesh`` data-parallel training via jit/pjit collectives,
- orbax checkpointing with resume (which the reference lacked).

Reference parity targets are documented per-module with ``file:line`` citations
into the reference repo.
"""

__version__ = "0.1.0"

from titanet_tpu import config as config  # noqa: F401
