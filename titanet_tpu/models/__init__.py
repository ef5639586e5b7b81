"""Model zoo: TitaNet S/M/L, ECAPA-TDNN, x-vector TDNN, ResNet r-vector,
MFA-Conformer, d-vector LSTM baseline, smoke-test convnet."""

import jax.numpy as jnp

from titanet_tpu.models.baselines import (  # noqa: F401
    DumbConvNet,
    DVectorBaseline,
)
from titanet_tpu.models.ecapa import (  # noqa: F401
    EcapaTdnn,
    get_ecapa,
)
from titanet_tpu.models.xvector import (  # noqa: F401
    XVector,
    get_xvector,
)
from titanet_tpu.models.resnet import (  # noqa: F401
    SpeakerResNet,
    get_resnet,
)
from titanet_tpu.models.conformer import (  # noqa: F401
    MfaConformer,
    get_conformer,
)
from titanet_tpu.models.quantized import (  # noqa: F401
    QuantTitaNet,
    quantize_titanet,
    titanet_apply_quantized,
)
from titanet_tpu.models.titanet import (  # noqa: F401
    TARGET_PARAMS,
    ConvBlock1d,
    Decoder,
    Encoder,
    MegaBlock,
    TitaNet,
    count_params,
    find_n_mega_blocks,
    get_titanet,
    stack_mega_block_params,
    unstack_mega_block_params,
)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2) semantics (reference src/models.py:333)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
