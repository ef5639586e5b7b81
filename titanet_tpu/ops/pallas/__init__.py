"""Fused Pallas TPU kernels for the hot DSP/compute paths."""

from titanet_tpu.ops.pallas.melspec import (  # noqa: F401
    log_mel_spectrogram_pallas,
    log_mel_spectrogram_pallas_fused,
)
