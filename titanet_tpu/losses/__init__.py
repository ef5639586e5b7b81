"""Metric-learning losses / classification heads.

Rebuild of the reference loss zoo (``/root/reference/src/losses.py``). Heads
are standalone flax modules with their OWN param tree — unlike the reference,
which attached the loss module to the model (src/models.py:318-339) so head
weights rode along inside ``model.state_dict()`` under ``loss_function.*``.
Here backbone and head params are explicitly separate trees, both
checkpointed, and the embedding path never depends on the head. Reference
checkpoints' heads migrate via
``titanet_tpu.utils.torch_compat.convert_head_state_dict``.

Every head returns ``(normalized_embeddings, predictions, loss)`` matching
the reference contract (src/losses.py:44,132,261).
"""

from titanet_tpu.losses.heads import (  # noqa: F401
    LOSSES,
    AngularMarginHead,
    ArcFaceHead,
    CEHead,
    CosFaceHead,
    GE2EHead,
    SphereFaceHead,
    build_head,
    head_param_count,
    renormalize_params,
)
