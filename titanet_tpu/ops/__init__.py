"""NN primitives and DSP ops, channels-last, TPU-first."""

from titanet_tpu.ops.conv import (  # noqa: F401
    DepthwiseSeparableConv1d,
    SamePadConv1d,
    conv1d_same,
    same_padding,
)
from titanet_tpu.ops.augment import (  # noqa: F401
    AugmentConfig,
    log_mel_specaugment,
    spec_augment,
)
from titanet_tpu.ops.norm import BatchNorm  # noqa: F401
from titanet_tpu.ops.pooling import (  # noqa: F401
    AttentiveStatsPooling,
    SimplePooling,
    attentive_stats,
)
from titanet_tpu.ops.se import SqueezeExcitation  # noqa: F401
